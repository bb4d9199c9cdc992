from . import components_diag, components_fixedvar, components_full  # noqa: F401

COV_MODULES = {
    "fixed": components_fixedvar,
    "diag": components_diag,
    "full": components_full,
}


def cov_module(covariance_type: str):
    """Dispatch table replacing the reference's class dispatch (fbgmm.py:130-137)."""
    try:
        return COV_MODULES[covariance_type]
    except KeyError:
        raise ValueError("Invalid covariance type: %r" % (covariance_type,))
