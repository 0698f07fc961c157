"""Scene pytree: one medium + one infinite emitter + stacked cameras.

The reference's scene abstraction (Mitsuba XML + ``mi.traverse``) collapses
to this pytree under the paper's own restrictions (single medium in a convex
null boundary, envmap/constant emitter only, no surfaces — reference:
python/integrators/volpathsimple.py:12-16, python/util.py:75-86).  The
``params`` pytree inside ``scene.medium`` plays the role of
``SceneParameters`` (reference python/optimize.py:135-136): optimizers update
it and :func:`update_medium_params` functionally rebuilds derived state
(majorant supergrid), replacing ``params.update()``.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import numpy as np

from .camera import Cameras
from .emitters import ConstantEmitter, EnvmapEmitter
from .medium import Medium, MediumConfig, MediumParams, finalize_medium

Emitter = Union[ConstantEmitter, EnvmapEmitter]


class Scene(NamedTuple):
    medium: Medium
    emitter: Emitter
    cameras: Cameras


def make_scene(params: MediumParams, cfg: MediumConfig, emitter: Emitter,
               cameras: Cameras, medium_to_world: np.ndarray = None) -> Scene:
    return Scene(medium=finalize_medium(params, cfg, medium_to_world),
                 emitter=emitter, cameras=cameras)


def update_medium_params(scene: Scene, params: MediumParams,
                         cfg: MediumConfig) -> Scene:
    """Functional equivalent of ``params.update(opt)``: swap the
    differentiable grids and rebuild the majorant supergrid."""
    m = finalize_medium(params, cfg, np.asarray(scene.medium.local_to_world))
    return scene._replace(medium=m)
