from .mesh import make_mesh, shard_segmenter  # noqa: F401
