from raytpu.dist.bigscene import (  # noqa: F401
    nearest_hit_ring,
    shard_scene_clusters,
)
from raytpu.dist.mesh import (  # noqa: F401
    hierarchical_pmean,
    make_mesh,
    replicate_scene,
)
from raytpu.dist.render import (  # noqa: F401
    render_image_multisampled_sharded,
    render_image_sharded,
    render_rays_sharded,
)
