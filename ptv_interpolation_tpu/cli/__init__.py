"""Command-line entry points (flag-compatible with the reference scripts).

python -m ptv_interpolation_tpu.cli.main          — interpolation pipeline
python -m ptv_interpolation_tpu.cli.analyze_flow  — analysis pipeline
python -m ptv_interpolation_tpu.cli.auto_align    — mask/points alignment
python -m ptv_interpolation_tpu.cli.pre_viewer    — interactive alignment check
python -m ptv_interpolation_tpu.cli.open_results  — results viewer
python -m ptv_interpolation_tpu.cli.view_divergence
python -m ptv_interpolation_tpu.cli.plot_flux
python -m ptv_interpolation_tpu.cli.compare_results
"""
