"""Top-level render entry point.

The analog of the reference's mode dispatch (RenderSelector +
GSGaussians::draw, /root/reference/apps/gsrast/GSGaussians.cpp:155-212) as a
pure function: `render(scene, camera, config)` returns the image plus
auxiliary state; the backend field selects the XLA path (differentiable
oracle) or the Pallas fast path.
"""

from __future__ import annotations

from typing import Union

from .. import config as cfg
from ..camera import Camera
from ..scene.gaussians import ActivatedGaussians, GaussianScene
from .dense import RenderOutput, render_dense
from .tiled import render_tiled_xla


def render(
    scene: Union[GaussianScene, ActivatedGaussians],
    camera: Camera,
    render_cfg: cfg.RenderConfig = cfg.RenderConfig(),
    mean2d_delta=None,
) -> RenderOutput:
    if isinstance(scene, GaussianScene):
        scene = scene.activated()
    if render_cfg.backend == "xla":
        return render_tiled_xla(scene, camera, render_cfg, mean2d_delta)
    if render_cfg.backend == "dense":
        return render_dense(scene, camera, render_cfg)
    if render_cfg.backend == "pallas":
        from .pallas_pipeline import render_tiled_pallas

        return render_tiled_pallas(scene, camera, render_cfg, mean2d_delta)
    raise ValueError(f"unknown backend {render_cfg.backend!r}")
