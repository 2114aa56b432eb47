from raytpu.scene.types import (  # noqa: F401
    FlatScene,
    Material,
    Mesh,
    Scene,
    SceneObject,
)
from raytpu.scene.lights import DirectionalLight, SpotLight  # noqa: F401
