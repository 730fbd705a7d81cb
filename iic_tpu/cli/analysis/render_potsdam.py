"""Analysis: render predictions for a Potsdam run. Mirror of
code/scripts/segmentation/analysis/render_potsdam.py — same machinery as
render_general (the dataset comes from the stored config)."""

from iic_tpu.cli.analysis.render_general import main

if __name__ == "__main__":
    main()
