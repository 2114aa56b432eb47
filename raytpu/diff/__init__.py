from raytpu.diff.params import apply_params, extract_params  # noqa: F401
from raytpu.diff.fit import fit, make_fit_step, render_loss  # noqa: F401
