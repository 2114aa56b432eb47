"""IO: image output, AVI video muxing, checkpointing.

Replaces the reference's per-frame PNG saves (Game1.cs:156-161) and the
avifil32.dll P/Invoke AVI layer (aviFileWrapper_src/, SURVEY.md §1 L6).
"""

from raytpu.io.image import read_image, write_image  # noqa: F401
from raytpu.io.avi import AviWriter, compile_video  # noqa: F401
