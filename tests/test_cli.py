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
