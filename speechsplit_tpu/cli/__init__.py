"""Command-line entry points.

Replaces the reference's script surface (README.md:53-57):

  python make_spect_f0.py   ->  python -m speechsplit_tpu.cli.preprocess
  python make_metadata.py   ->  python -m speechsplit_tpu.cli.metadata
  python main.py            ->  python -m speechsplit_tpu.cli.train
  demo.ipynb cell-0/1       ->  python -m speechsplit_tpu.cli.convert
"""
