"""Config registries: scenes x integrators x optimization presets.

Mirrors the reference's three-tier dataclass config system
(python/scene_config.py:74-92, python/opt_config.py:113-169).  The paper's
scene *assets* (.vol volumes + HDR envmaps, downloadable per README.md:116-125)
are replaced by procedural generators with the same scale envelope
(up to 256^3 grids, 60+ sensors, density scales 2-100); a scene registered
with ``scene_xml`` instead loads the original Mitsuba XML scene + assets
(config/xml_scene.py) when present under $UIVR_SCENE_DIR.
"""
from __future__ import annotations

from copy import deepcopy
from dataclasses import dataclass, field, replace
from typing import Callable, Dict, List, Optional

from ..integrators import NerfConfig, VolpathConfig
from .scenes import SceneBundle, cube_test_scene, smoke_scene


# ---------------------------------------------------------------- integrators

@dataclass(frozen=True)
class IntegratorPreset:
    """Named integrator configuration (reference IntegratorConfig,
    opt_config.py:83-108)."""
    name: str
    pretty_name: str
    kind: str                      # 'nerf' | 'volpath'
    params: Dict = field(default_factory=dict)
    uses_fd: bool = False
    fd_epsilon: Optional[float] = None
    fd_spp_multiplier: int = 16

    def create(self, max_depth: int):
        if self.kind == "nerf":
            return NerfConfig(**self.params)
        # rr_depth = max_depth + 1000 disables Russian roulette
        # (reference opt_config.py:106)
        return VolpathConfig(max_depth=max_depth,
                             rr_depth=max_depth + 1000, **self.params)


_INTEGRATORS: Dict[str, IntegratorPreset] = {}


def add_int_config(name: str, **kwargs) -> None:
    assert name not in _INTEGRATORS, f"duplicate integrator config: {name}"
    _INTEGRATORS[name] = IntegratorPreset(name=name, **kwargs)


def get_int_config(name: str) -> IntegratorPreset:
    return deepcopy(_INTEGRATORS[name])


def list_int_configs() -> List[str]:
    return sorted(_INTEGRATORS)


# the five presets of the reference (opt_config.py:123-169)
add_int_config("fd-forward", pretty_name="Finite differences",
               kind="volpath", params={"use_drt": False},
               uses_fd=True, fd_epsilon=5e-3)
add_int_config("volpathsimple-drt",
               pretty_name="Differential Ratio Tracking", kind="volpath",
               params={"use_drt": True, "use_drt_subsampling": True,
                       "use_drt_mis": True})
add_int_config("volpathsimple-drt-quadratic",
               pretty_name="Differential Ratio Tracking (quadratic)",
               kind="volpath",
               params={"use_drt": True, "use_drt_subsampling": False,
                       "use_drt_mis": True, "engine": "nested"})
add_int_config("volpathsimple-basic", pretty_name="Free-flight based",
               kind="volpath", params={"use_drt": False})
add_int_config("nerf", pretty_name="NeRF (grid-backed)", kind="nerf",
               params={"queries_per_ray": 128})


# ---------------------------------------------------------------- scenes

@dataclass(frozen=True)
class ScenePreset:
    """Named scene configuration (reference SceneConfig, scene_config.py:9-71)."""
    name: str
    builder: Callable[..., SceneBundle]
    builder_kwargs: Dict = field(default_factory=dict)
    max_depth: int = 64
    # reference scene_config.py:24: reference images render at 8192 spp so
    # production reconstructions are estimator-limited, not reference-noise
    # limited; smoke runs override via `reproduce --ref-spp`
    ref_spp: int = 8192
    # integrator used to render the reference images (the reference repo
    # renders refs with the physically-based tracer even for the nerf
    # bootstrap stage — scene_config.py:25 ref_integrator)
    ref_integrator: str = "volpathsimple-basic"
    max_density: float = 250.0
    param_lr_factors: Dict[str, float] = field(
        default_factory=lambda: {"albedo": 2.0})
    # warm start from a previous stage's checkpoint directory
    warm_start_from: Optional[str] = None
    # Mitsuba XML scene (reference SceneConfig.fname + scene vars,
    # scene_config.py:99-113): when the file exists under $UIVR_SCENE_DIR
    # (default ./scenes), the calibrated sensor rig + real .vol/.hdr assets
    # are loaded through config/xml_scene.py; otherwise build() falls back
    # to the procedural stand-in `builder`.
    scene_xml: Optional[str] = None
    # NORMAL (training) scene variables — reference normal_scene_vars
    # (scene_config.py:99-104): janga/dust-devil training scenes do NOT
    # load the ground-truth volumes; those live only in ref_scene_vars.
    scene_vars: Dict = field(default_factory=dict)
    # Reference-render scene variables + optional dedicated ref scene file
    # (reference ref_scene_vars / ref_fname, scene_config.py:26-27,51-52).
    # ref_scene_vars None = same as scene_vars.  astronaut/rover/tree-2
    # reference a SURFACE scene (*-ref.xml, ref_integrator='path') that a
    # volumes-only framework cannot render — build_ref() raises for those
    # when the asset exists (see PARITY.md).
    ref_scene_vars: Optional[Dict] = None
    ref_xml: Optional[str] = None
    start_from_value: Dict = field(default_factory=dict)
    # Calibrated sensor-index subsets (reference SceneConfig.sensors /
    # preview_sensors, scene_config.py:15,28,63): training + reference
    # renders restrict to `sensors` (None = all); previews default to the
    # first training sensor.
    sensors: Optional[tuple] = None
    preview_sensors: Optional[tuple] = None

    def _apply_rig(self, b: SceneBundle) -> SceneBundle:
        n = b.cameras.n_sensors
        if self.sensors and max(self.sensors) < n:
            b.sensors = tuple(self.sensors)
        if self.preview_sensors and max(self.preview_sensors) < n:
            b.preview_sensors = tuple(self.preview_sensors)
        return b

    def build(self) -> SceneBundle:
        """TRAINING scene (reference load_scene(reference=False),
        optimize.py:15-19): normal scene vars, start_from_value grids."""
        import os
        if self.scene_xml:
            root = os.environ.get("UIVR_SCENE_DIR", "scenes")
            path = os.path.join(root, self.scene_xml)
            if os.path.exists(path):
                from .xml_scene import load_xml_scene
                b = load_xml_scene(path, variables=self.scene_vars,
                                   start_from_value=self.start_from_value,
                                   max_density=self.max_density)
                b.max_depth = self.max_depth
                return self._apply_rig(b)
        b = self.builder(**self.builder_kwargs)
        b.max_depth = self.max_depth
        b.max_density = self.max_density
        return self._apply_rig(b)

    def build_ref(self) -> SceneBundle:
        """REFERENCE-render scene (reference load_scene(reference=True),
        optimize.py:15-19): ground-truth volumes via ref_scene_vars, and
        the dedicated ref scene file when the scene has one."""
        import os
        xml = self.ref_xml or self.scene_xml
        if xml:
            root = os.environ.get("UIVR_SCENE_DIR", "scenes")
            path = os.path.join(root, xml)
            if (self.ref_xml and not os.path.exists(path)
                    and os.path.exists(os.path.join(root, self.scene_xml))):
                # scene assets present but the DEDICATED ref scene missing:
                # falling back to build() would render "references" of the
                # training scene's INITIAL volumes — refuse loudly instead
                raise FileNotFoundError(
                    f"{self.name}: reference scene {path} is missing while "
                    f"{self.scene_xml} exists; references rendered from the "
                    "training scene would be meaningless")
            if os.path.exists(path):
                if self.ref_xml and self.ref_integrator == "path":
                    raise NotImplementedError(
                        f"{self.name}: the reference renders its reference "
                        "images from a SURFACE scene with a 'path' "
                        "integrator; this volumes-only framework cannot — "
                        "provide precomputed references (see PARITY.md)")
                from .xml_scene import load_xml_scene
                vars_ = (self.ref_scene_vars
                         if self.ref_scene_vars is not None
                         else self.scene_vars)
                b = load_xml_scene(path, variables=vars_,
                                   max_density=self.max_density)
                b.max_depth = self.max_depth
                return self._apply_rig(b)
        # procedural stand-in: bundle.params ARE the ground-truth grids
        return self.build()


_SCENES: Dict[str, ScenePreset] = {}


def add_scene_config(name: str, **kwargs) -> None:
    assert name not in _SCENES, f"duplicate scene config: {name}"
    _SCENES[name] = ScenePreset(name=name, **kwargs)


def add_scene_config_variant(name: str, base: str, **kwargs) -> None:
    assert name not in _SCENES, f"duplicate scene config: {name}"
    _SCENES[name] = replace(deepcopy(_SCENES[base]), name=name, **kwargs)


def get_scene_config(name: str) -> ScenePreset:
    return deepcopy(_SCENES[name])


def list_scene_configs() -> List[str]:
    return sorted(_SCENES)


# Procedural stand-ins matching the reference production scenes' envelopes
# (scene_config.py:95-348): grid res, density scale, sensor counts.
add_scene_config("tiny-cube", builder=cube_test_scene,
                 builder_kwargs={"resx": 64, "resy": 64}, max_depth=16,
                 max_density=20.0)
# Calibrated 64-camera rig subsets, verbatim from the reference
# (scene_config.py:114,164,218,270,321): janga/rover skip sensors 52+53,
# dust-devil skips 53, astronaut/tree-2 train on all 64.  They take effect
# when the real XML assets (64-sensor rigs) load; the PROCEDURAL stand-ins
# keep their historical camera counts (62/63/61) so round-2 runs resume
# cleanly, and ScenePreset._apply_rig's validity guard leaves
# bundle.sensors=None there (train on every stand-in camera).
_SENS_NO_52_53 = tuple(i for i in range(64) if i not in (52, 53))
_SENS_NO_53 = tuple(i for i in range(64) if i != 53)
_SENS_ALL = tuple(range(64))

add_scene_config("janga-smoke", builder=smoke_scene,
                 scene_xml='janga-smoke/janga-smoke.xml',
                 scene_vars={'resx': 720, 'resy': 620, 'envmap_filename': 'textures/gamrig_2k.hdr', 'majorant_resolution_factor': 8},
                 ref_scene_vars={'resx': 720, 'resy': 620, 'medium_filename': 'volumes/janga-smoke-264-136-136.vol', 'albedo_filename': 'volumes/albedo-noise-256-128-128.vol', 'emission_filename': 'volumes/albedo-noise-256-128-128.vol', 'envmap_filename': 'textures/gamrig_2k.hdr', 'majorant_resolution_factor': 8},
                 sensors=_SENS_NO_52_53,
                 start_from_value={'medium1.sigma_t.data': 0.002, 'medium1.albedo.data': 0.6, 'medium1.emission.data': 0.005},
                 builder_kwargs={"res": 128, "resx": 180, "resy": 155,
                                 "n_sensors": 62, "density_scale": 20.0,
                                 "seed": 1, "majorant_factor": 16})
add_scene_config("dust-devil", builder=smoke_scene,
                 scene_xml='dust-devil/dust-devil.xml',
                 scene_vars={'resx': 620, 'resy': 720, 'envmap_filename': 'textures/kloofendal_38d_partly_cloudy_4k.exr', 'majorant_resolution_factor': 8},
                 ref_scene_vars={'resx': 620, 'resy': 720, 'medium_filename': 'volumes/embergen_dust_devil_tornado_a_50-256-256-256.vol', 'albedo_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'emission_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'envmap_filename': 'textures/kloofendal_38d_partly_cloudy_4k.exr', 'majorant_resolution_factor': 8},
                 sensors=_SENS_NO_53,
                 start_from_value={'medium1.sigma_t.data': 0.0004, 'medium1.albedo.data': 0.6, 'medium1.emission.data': 0.001},
                 builder_kwargs={"res": 256, "resx": 155, "resy": 180,
                                 "n_sensors": 63, "density_scale": 100.0,
                                 "seed": 2, "majorant_factor": 32})
add_scene_config("astronaut-rotated", builder=smoke_scene,
                 scene_xml='astronaut-rotated/astronaut-rotated.xml',
                 ref_xml='astronaut-rotated/astronaut-rotated-ref.xml',
                 ref_integrator="path",
                 scene_vars={'resx': 720, 'resy': 1080, 'medium_filename': 'volumes/sigma_t-constant-sand-256-256-256.vol', 'albedo_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'emission_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'envmap_filename': 'textures/skylit_garage_4k.exr', 'majorant_resolution_factor': 8},
                 ref_scene_vars={'resx': 720, 'resy': 1080, 'envmap_filename': 'textures/skylit_garage_4k.exr'},
                 sensors=_SENS_ALL, preview_sensors=(0,),
                 start_from_value={'medium1.sigma_t.data': 0.04, 'medium1.albedo.data': 0.6, 'medium1.emission.data': 0.1},
                 builder_kwargs={"res": 128, "resx": 120, "resy": 180,
                                 "n_sensors": 64, "density_scale": 2.0,
                                 "seed": 3, "majorant_factor": 16})
add_scene_config("rover", builder=smoke_scene,
                 scene_xml='rover/rover.xml',
                 ref_xml='rover/rover-ref.xml',
                 ref_integrator="path",
                 scene_vars={'resx': 860, 'resy': 720, 'medium_filename': 'volumes/sigma_t-constant-sand-256-256-256.vol', 'albedo_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'emission_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'envmap_filename': 'textures/gamrig_2k.hdr', 'majorant_resolution_factor': 8},
                 ref_scene_vars={'resx': 860, 'resy': 720, 'envmap_filename': 'textures/gamrig_2k.hdr'},
                 sensors=_SENS_NO_52_53,
                 start_from_value={'medium1.sigma_t.data': 0.04, 'medium1.albedo.data': 0.6, 'medium1.emission.data': 0.1},
                 builder_kwargs={"res": 128, "resx": 215, "resy": 180,
                                 "n_sensors": 61, "density_scale": 2.0,
                                 "seed": 4, "majorant_factor": 16})
add_scene_config("tree-2", builder=smoke_scene,
                 scene_xml='tree-2/tree-2.xml',
                 ref_xml='tree-2/tree-2-ref.xml',
                 ref_integrator="path",
                 scene_vars={'resx': 720, 'resy': 900, 'medium_filename': 'volumes/sigma_t-constant-sand-256-256-256.vol', 'albedo_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'emission_filename': 'volumes/albedo-constant-sand-256-256-256.vol', 'envmap_filename': 'textures/round_platform_2k.hdr', 'majorant_resolution_factor': 8},
                 ref_scene_vars={'resx': 720, 'resy': 900, 'envmap_filename': 'textures/round_platform_2k.hdr'},
                 sensors=_SENS_ALL,
                 start_from_value={'medium1.sigma_t.data': 0.04, 'medium1.albedo.data': 0.6, 'medium1.emission.data': 0.1},
                 builder_kwargs={"res": 128, "resx": 144, "resy": 180,
                                 "n_sensors": 64, "density_scale": 2.0,
                                 "seed": 5, "majorant_factor": 16})
for _base in ("janga-smoke", "dust-devil", "astronaut-rotated", "rover",
              "tree-2"):
    _extra = {}
    if _base == "dust-devil":
        # reference scene_config.py:191: dust-devil-from-nerf trains albedo
        # at a 100x base LR (all other -from-nerf variants keep the default
        # albedo factor 2.0 from SceneConfig.__post_init__)
        _extra["param_lr_factors"] = {"albedo": 100.0}
    add_scene_config_variant(f"{_base}-from-nerf", _base,
                             warm_start_from=f"{_base}/nerf/params",
                             **_extra)
