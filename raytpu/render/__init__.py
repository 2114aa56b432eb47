from raytpu.render.wavefront import render_image, trace_colors  # noqa: F401
