# Submodules (dp, random, stats, pallas_kernels) are imported directly by
# consumers; keep this __init__ empty to avoid import cycles.
