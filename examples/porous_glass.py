"""Porous-glass production configuration.

Equivalent of the reference launchers `run_porous_glass.py` and
`interpolate_porous_glass.py` (which subprocess `main.py` with hardcoded
lab-machine paths): the same parameter set expressed as a
:class:`PipelineConfig`, called in-process. Point ``INPUT_CSV``/``INPUT_MASK``
at your dataset.

The full production flag set mirrors `interpolate_porous_glass.py:35-89`:
sibson (k=50) + variational cleaning (λ=200) + boundary particles
(stride 50, thickness 2) + outlier filtering (k=30, threshold 4, vmax 5).
"""

import os

from ptv_interpolation_tpu.pipeline import PipelineConfig, run_pipeline

INPUT_CSV = os.environ.get("PTV_INPUT_CSV", "sinteredGlass_velocityPoints.csv")
INPUT_MASK = os.environ.get("PTV_INPUT_MASK", "poreMask_binary.tif")

CONFIG = PipelineConfig(
    input=INPUT_CSV,
    mask=INPUT_MASK,
    crop=(175, 497, 160, 497, 60, 546),
    data_offset=(175, 160, 60),
    method="sibson",
    downscale=2.0,
    rbf_neighbors=20,
    smoothing=5.0,
    idw_power=2.0,
    idw_neighbors=40,
    sibson_neighbors=50,
    divergence_free=True,
    cleaning_method="variational",
    cleaning_lambda=200.0,
    iterations=5,
    boundary_particles=True,
    boundary_sampling=50,
    boundary_thickness=2,
    filter_outliers=True,
    filter_neighbors=30,
    filter_threshold=4.0,
    filter_max_speed=5.0,
    output_tif="sinteredGlass_interpolated_sibson_var.tif",
    output_npz="sinteredGlass_interpolated_sibson_var.npz",
)


def run():
    print("--- PTV Interpolation for Porous Glass Data ---")
    if not os.path.exists(INPUT_CSV):
        print(f"Warning: Input CSV not found at {INPUT_CSV}")
    if not os.path.exists(INPUT_MASK):
        print(f"Warning: Input Mask not found at {INPUT_MASK}")
    return run_pipeline(CONFIG)


if __name__ == "__main__":
    run()
