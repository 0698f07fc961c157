"""Round-5 probe: reference-render throughput on the real janga XML assets.

Times one 180x155 reference frame (sensor 0 and the round-4 worst-case
sensor 31) at a given spp, with and without shadow-walk RR, to size the
--ref-spp budget for the flagship run before committing hours of TPU time.
"""
import os
import sys
import time

os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclasses import replace

from uivr_tpu.config.registry import get_int_config, get_scene_config
from uivr_tpu.render import RenderSettings
from uivr_tpu.render.batched import render_image

SPP = int(os.environ.get("PROBE_SPP", 256))
FILM = float(os.environ.get("PROBE_FILM", 0.25))
SHADOW_RR = float(os.environ.get("PROBE_SHADOW_RR", 0.0))
SENSORS = [int(s) for s in os.environ.get("PROBE_SENSORS", "0,31").split(",")]

preset = get_scene_config("janga-smoke")
bundle = preset.build_ref()
W, H = bundle.film_size
bundle.film_size = (max(16, int(W * FILM)), max(16, int(H * FILM)))
W, H = bundle.film_size
print(f"[probe] film {W}x{H} spp={SPP} shadow_rr={SHADOW_RR}", flush=True)

ref_int = get_int_config("volpathsimple-basic").create(max_depth=preset.max_depth)
ref_int = replace(ref_int, rr_depth=5)
if SHADOW_RR > 0:
    ref_int = replace(ref_int, shadow_rr=SHADOW_RR)
settings = RenderSettings(integrator=ref_int, medium=bundle.medium_cfg,
                          film_size=bundle.film_size, spp=SPP, spp_grad=SPP)

for s in SENSORS:
    t0 = time.time()
    img = render_image(settings, bundle.params, bundle.emitter,
                       bundle.cameras, s, seed=1234, spp=SPP,
                       medium_to_world=bundle.to_world)
    dt = time.time() - t0
    rays = W * H * SPP
    print(f"[probe] sensor {s}: {dt:.1f} s, {rays/1e6:.1f} Mrays, "
          f"{rays/dt/1e6:.3f} Mrays/s, mean={np.mean(img):.4f}", flush=True)
