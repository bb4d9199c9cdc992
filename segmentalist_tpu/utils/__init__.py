from . import annealing  # noqa: F401
