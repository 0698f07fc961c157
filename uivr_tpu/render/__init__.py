from .batched import (  # noqa: F401
    RenderSettings, make_render, render_image, sample_batch_pixels,
)
