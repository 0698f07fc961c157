"""Mitsuba XML scene ingestion (reference optimize.py:14-21,
scene_config.py:99-113): $var substitution, calibrated sensor rigs,
envmap + heterogeneous-medium shapes from .vol/.hdr assets."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from uivr_tpu.config.xml_scene import load_xml_scene, _parse_transform
from uivr_tpu.core.hdr_io import read_hdr, write_hdr
from uivr_tpu.core.vol_io import write_vol

_XML = """<scene version="3.0.0">
    <default name="resx" value="120"/>
    <default name="resy" value="90"/>
    <default name="majorant_resolution_factor" value="8"/>
    <default name="envmap_filename" value="sky.hdr"/>
    <integrator type="volpathsimple">
        <integer name="max_depth" value="64"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="35"/>
        <transform name="to_world">
            <lookat origin="4, 1.5, 4" target="0, 0.6, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="$resx"/>
            <integer name="height" value="$resy"/>
        </film>
        <sampler type="independent"/>
    </sensor>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="to_world">
            <matrix value="1 0 0 0  0 1 0 2  0 0 1 -5  0 0 0 1"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="$resx"/>
            <integer name="height" value="$resy"/>
        </film>
    </sensor>
    <emitter type="envmap">
        <string name="filename" value="$envmap_filename"/>
        <float name="scale" value="2.0"/>
        <transform name="to_world">
            <rotate y="1" angle="90"/>
        </transform>
    </emitter>
    <shape type="cube">
        <transform name="to_world">
            <scale value="1.5"/>
            <translate x="0" y="0.5" z="0"/>
        </transform>
        <bsdf type="null"/>
        <medium type="heterogeneous" name="interior">
            <volume type="gridvolume" name="sigma_t">
                <string name="filename" value="$medium_filename"/>
            </volume>
            <volume type="gridvolume" name="albedo">
                <string name="filename" value="albedo.vol"/>
            </volume>
            <volume type="constvolume" name="emission">
                <float name="value" value="0.05"/>
            </volume>
            <float name="scale" value="20"/>
            <integer name="majorant_resolution_factor"
                     value="$majorant_resolution_factor"/>
            <phase type="isotropic"/>
        </medium>
    </shape>
</scene>
"""


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("xmlscene")
    rs = np.random.RandomState(3)
    sigma = rs.rand(12, 10, 8, 1).astype(np.float32)
    albedo = rs.rand(12, 10, 8, 3).astype(np.float32)
    write_vol(str(d / "density.vol"), sigma)
    write_vol(str(d / "albedo.vol"), albedo)
    sky = (rs.rand(16, 32, 3).astype(np.float32)) ** 2 + 0.05
    write_hdr(str(d / "sky.hdr"), sky)
    (d / "scene.xml").write_text(_XML)
    return d, sigma, albedo, sky


def test_transform_composition():
    import xml.etree.ElementTree as ET
    node = ET.fromstring(
        "<transform><scale value='2'/><translate x='1' y='0' z='0'/>"
        "</transform>")
    m = _parse_transform(node, {})
    # Mitsuba order: scale applied first, then translate
    p = m @ np.array([1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(p[:3], [3.0, 2.0, 2.0], atol=1e-6)


def test_load_xml_scene(assets):
    d, sigma, albedo, sky = assets
    b = load_xml_scene(
        str(d / "scene.xml"),
        variables={"medium_filename": "density.vol"},
        start_from_value={"medium1.sigma_t.data": 0.002,
                          "medium1.albedo.data": 0.6,
                          "medium1.emission.data": 0.005})
    assert b.film_size == (120, 90)
    assert b.cameras.n_sensors == 2
    # sensor 2's matrix to_world passes through verbatim
    np.testing.assert_allclose(np.asarray(b.cameras.cam_to_world[1, :3, 3]),
                               [0.0, 2.0, -5.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.cameras.tan_half_fov[1]),
                               np.tan(np.deg2rad(40) / 2), rtol=1e-5)
    # grids loaded with (D, H, W, C) layout
    assert b.params.sigma_t.shape == (12, 10, 8, 1)
    np.testing.assert_allclose(np.asarray(b.params.sigma_t), sigma, atol=0)
    np.testing.assert_allclose(np.asarray(b.params.albedo), albedo, atol=0)
    np.testing.assert_allclose(np.asarray(b.params.emission), 0.05)
    assert b.medium_cfg.scale == 20.0
    assert b.medium_cfg.majorant_factor == 8
    # cube shape: [-1,1]^3 scaled by 1.5 then translated by (0,.5,0):
    # unit-cube local corner (0,0,0) -> (-1.5, -1.0, -1.5)
    corner = b.to_world @ np.array([0, 0, 0, 1.0], np.float32)
    np.testing.assert_allclose(corner[:3], [-1.5, -1.0, -1.5], atol=1e-5)
    corner = b.to_world @ np.array([1, 1, 1, 1.0], np.float32)
    np.testing.assert_allclose(corner[:3], [1.5, 2.0, 1.5], atol=1e-5)
    # envmap scaled by 2, rotated 90deg about y
    assert b.emitter.data.shape == (16, 32, 3)
    np.testing.assert_allclose(np.asarray(b.emitter.data).mean(),
                               2.0 * sky.mean(), rtol=0.01)
    # start_from_value honored
    np.testing.assert_allclose(np.asarray(b.start_from.sigma_t), 0.002)


def test_xml_scene_renders(assets):
    d, *_ = assets
    from uivr_tpu.integrators import VolpathConfig
    from uivr_tpu.render import RenderSettings, make_render

    b = load_xml_scene(str(d / "scene.xml"),
                       variables={"medium_filename": "density.vol"})
    cfg = VolpathConfig(max_depth=4, engine="flat")
    st = RenderSettings(integrator=cfg, medium=b.medium_cfg,
                        film_size=b.film_size, spp=4, spp_grad=2)
    render = make_render(st, b.to_world)
    pix = jnp.asarray(np.stack(np.meshgrid(np.arange(0, 120, 20),
                                           np.arange(0, 90, 15)),
                               -1).reshape(-1, 2).astype(np.int32))
    sidx = jnp.asarray((np.arange(pix.shape[0]) % 2).astype(np.int32))
    img = np.asarray(render(b.params, b.emitter, b.cameras, sidx, pix,
                            jnp.uint32(1), jnp.uint32(2)))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_mixed_resolution_grids_resampled(assets):
    """GT assets may pair grids at different resolutions (the paper's janga
    scene: 264x136x136 sigma_t with a 256x128x128 albedo-noise volume,
    reference scene_config.py:105-113).  Ingestion resamples secondary
    grids onto sigma_t's resolution so the fused kernel's combined
    sigma+albedo corner-table row gather stays valid."""
    d, sigma, albedo, sky = assets
    rs = np.random.RandomState(11)
    alb_small = rs.rand(6, 5, 4, 3).astype(np.float32)
    write_vol(str(d / "albedo_small.vol"), alb_small)
    xml = _XML.replace('value="albedo.vol"', 'value="albedo_small.vol"')
    (d / "scene_mixed.xml").write_text(xml)
    b = load_xml_scene(str(d / "scene_mixed.xml"),
                       variables={"medium_filename": "density.vol"})
    assert b.params.sigma_t.shape == (12, 10, 8, 1)
    assert b.params.albedo.shape == (12, 10, 8, 3)
    assert b.params.emission.shape == (12, 10, 8, 3)
    # resampling preserves the field's range and its grid-corner values
    assert float(b.params.albedo.min()) >= float(alb_small.min()) - 1e-6
    assert float(b.params.albedo.max()) <= float(alb_small.max()) + 1e-6
    np.testing.assert_allclose(np.asarray(b.params.albedo[0, 0, 0]),
                               alb_small[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.params.albedo[-1, -1, -1]),
                               alb_small[-1, -1, -1], atol=1e-6)
    # the combined corner table builds (the equal-shape invariant holds)
    from uivr_tpu.scene.medium import finalize_medium
    m = finalize_medium(b.params, b.medium_cfg, b.to_world)
    assert m.combined_ct is not None
