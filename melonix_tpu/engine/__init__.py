from .grains import GrainTable, build_grain_table
from .maps import MapKnots
from .render import RenderPlan, build_render_plan, render, render_track

__all__ = [
    "GrainTable",
    "build_grain_table",
    "MapKnots",
    "RenderPlan",
    "build_render_plan",
    "render",
    "render_track",
]
