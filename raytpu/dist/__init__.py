from raytpu.dist.mesh import make_mesh, replicate_scene  # noqa: F401
from raytpu.dist.render import render_image_sharded, render_rays_sharded  # noqa: F401
