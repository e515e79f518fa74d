"""Synthetic-shape primitive generators, reference-named surface.

Counterpart of reference gluefactory/multipoint/utils/draw_primitives.py
(643 LoC): the drawing functions that SyntheticShapes consumes. Here the
primitives live with the dataset (multipoint/datasets/synthetic_shapes.py
— generate_background, draw_lines/polygon/multiple_polygons/ellipses/star/
checkerboard/stripes/cube, gaussian_noise); this module re-exports them
under the reference module path for API parity.

Signature note: the reference mutates module-global RNG state; ours thread
an explicit np.random.RandomState as the first argument (hermetic tests and
the multi-process trainer need per-sample determinism).
"""

from ..datasets.synthetic_shapes import (  # noqa: F401
    PRIMITIVES,
    draw_checkerboard,
    draw_cube,
    draw_ellipses,
    draw_lines,
    draw_multiple_polygons,
    draw_polygon,
    draw_star,
    draw_stripes,
    gaussian_noise,
    generate_background,
)

__all__ = [
    "PRIMITIVES",
    "generate_background",
    "draw_lines",
    "draw_polygon",
    "draw_multiple_polygons",
    "draw_ellipses",
    "draw_star",
    "draw_checkerboard",
    "draw_stripes",
    "draw_cube",
    "gaussian_noise",
]
