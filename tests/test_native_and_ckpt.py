"""Native C++ kernels + full-state checkpoint/resume."""
import numpy as np
import jax.numpy as jnp

from uivr_tpu import native
from uivr_tpu.opt import (OptimizationConfig, adam_init, adam_step,
                          load_state, save_state)
from uivr_tpu.scene.medium import MediumParams


def test_native_alias_matches_python():
    pmf = np.random.RandomState(0).rand(4096)
    pmf /= pmf.sum()
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    a, p = native.build_alias_table(pmf)
    # statistical validation: alias sampling reproduces the pmf
    N = pmf.size
    rs = np.random.RandomState(1)
    u = rs.rand(2_000_000)
    slot = np.minimum((u * N).astype(int), N - 1)
    frac = u * N - slot
    keep = frac < p[slot]
    texel = np.where(keep, slot, a[slot])
    counts = np.zeros(N)
    np.add.at(counts, texel, 1.0)
    emp = counts / counts.sum()
    assert np.abs(emp - pmf).max() < 5e-4


def test_native_exr_predictor_roundtrip():
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(2)
    data = rs.bytes(10001)
    enc = native.exr_zip_predict(data)
    dec = native.exr_zip_unpredict(enc)
    assert dec == data


def test_full_state_checkpoint_roundtrip(tmp_path):
    params = MediumParams(
        sigma_t=jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1),
        albedo=jnp.ones((2, 2, 2, 3)) * 0.5,
        emission=jnp.zeros((2, 2, 2, 3)))
    st = adam_init(params)
    params2, st2 = adam_step(params, params, st,
                             MediumParams(0.1, 0.1, 0.1))
    path = str(tmp_path / "state")
    save_state(path, params2, st2, 41)
    restored = load_state(path)
    assert restored is not None
    rp, rs_, rit = restored
    assert rit == 41
    for a, b in zip(rp, params2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(rs_.mu, st2.mu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(rs_.step) == int(st2.step)


def test_optimization_resumes(tmp_path):
    """Interrupt an optimization, rerun, and check it continues instead of
    restarting (capability the reference lacks)."""
    from uivr_tpu.config import cube_test_scene
    from uivr_tpu.integrators import NerfConfig
    from uivr_tpu.opt import run_optimization

    b = cube_test_scene(resx=16, resy=16)
    opt = OptimizationConfig(name="resume-test", spp=2, n_iter=8, lr=1e-2,
                             primal_spp_factor=2, batch_size=64,
                             checkpoint_stride=4, preview_stride=10**9,
                             render_initial=False, render_final=False)
    out = str(tmp_path / "run")
    run_optimization(out, opt, b, NerfConfig(queries_per_ray=8),
                     ref_spp=4, verbose=False)
    import json, os
    n_lines_1 = sum(1 for _ in open(os.path.join(out, "metrics.jsonl")))
    # second invocation must resume from the saved state (iteration 4),
    # not redo 0..3
    run_optimization(out, opt, b, NerfConfig(queries_per_ray=8),
                     ref_spp=4, verbose=False)
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))
             if "it" in json.loads(l)]
    assert any(l["it"] >= 5 for l in lines)
    all_lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    its = [l["it"] for l in all_lines[n_lines_1:] if "it" in l]
    assert all(i >= 5 for i in its), its


def test_registry_and_cli_presets():
    from uivr_tpu.config import (get_int_config, get_scene_config,
                                 list_int_configs, list_scene_configs)
    assert set(list_int_configs()) >= {
        "fd-forward", "nerf", "volpathsimple-basic", "volpathsimple-drt",
        "volpathsimple-drt-quadratic"}
    assert set(list_scene_configs()) >= {
        "tiny-cube", "janga-smoke", "dust-devil", "astronaut-rotated",
        "rover", "tree-2", "janga-smoke-from-nerf"}
    cfg = get_int_config("volpathsimple-drt").create(max_depth=32)
    assert cfg.use_drt and cfg.use_drt_subsampling and cfg.rr_depth == 1032
    cfgq = get_int_config("volpathsimple-drt-quadratic").create(max_depth=8)
    assert cfgq.engine == "nested" and not cfgq.use_drt_subsampling
    scene = get_scene_config("tiny-cube").build()
    assert scene.max_depth == 16


def test_native_hdr_decode_matches_python(tmp_path):
    """native/uivr_native.cpp hdr_decode_scanlines vs the pure-Python RGBE
    reader: bitwise-equal on flat and new-style-RLE files."""
    import uivr_tpu.native as nat
    from uivr_tpu.core import hdr_io

    rs = np.random.RandomState(5)
    img = (rs.rand(33, 64, 3).astype(np.float32) * 4) ** 2
    p_flat = str(tmp_path / "flat.hdr")
    hdr_io.write_hdr(p_flat, img)

    W, H = 64, 2
    head = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {H} +X {W}\n".encode())
    body = b""
    for _y in range(H):
        sl = bytes([2, 2, W >> 8, W & 255])
        for c, v in enumerate([128, 64, 32, 140]):
            sl += (bytes([128 + 32, v]) + bytes([16])
                   + bytes(range(c, c + 16)) + bytes([128 + 16, v + 1]))
        body += sl
    p_rle = str(tmp_path / "rle.hdr")
    with open(p_rle, "wb") as f:
        f.write(head + body)

    for p in (p_flat, p_rle):
        a = hdr_io.read_hdr(p)
        orig = nat.hdr_decode_scanlines
        nat.hdr_decode_scanlines = lambda *args: None   # force Python path
        try:
            b = hdr_io.read_hdr(p)
        finally:
            nat.hdr_decode_scanlines = orig
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)


def test_hdr_old_style_long_runs(tmp_path):
    """Radiance old-style RLE: CONSECUTIVE (1,1,1,n) markers shift the
    repeat count 8 bits each (runs > 255 px).  1 + 43 + (2<<8) = 556 = W;
    both decoders must expand the run to the full scanline."""
    import uivr_tpu.native as nat
    from uivr_tpu.core import hdr_io

    W, H = 556, 2
    head = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {H} +X {W}\n".encode())
    px = bytes([100, 120, 140, 136])
    body = (px + bytes([1, 1, 1, 43]) + bytes([1, 1, 1, 2])) * H
    p = str(tmp_path / "oldrle.hdr")
    with open(p, "wb") as f:
        f.write(head + body)

    a = hdr_io.read_hdr(p)
    orig = nat.hdr_decode_scanlines
    nat.hdr_decode_scanlines = lambda *args: None       # force Python path
    try:
        b = hdr_io.read_hdr(p)
    finally:
        nat.hdr_decode_scanlines = orig
    assert a.shape == (H, W, 3)
    np.testing.assert_array_equal(a, b)
    # whole scanline equals the first pixel's decoded value
    np.testing.assert_array_equal(a, np.broadcast_to(a[:, :1], a.shape))
