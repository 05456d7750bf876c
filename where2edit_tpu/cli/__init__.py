"""Command-line entry points mirroring the reference scripts.

  python -m where2edit_tpu.cli.run_clustering   ↔ attention/clustering_feature.py
  python -m where2edit_tpu.cli.run_attention    ↔ attention/run_attention.py
  python -m where2edit_tpu.cli.mapper_train     ↔ mapper/scripts/train.py
  python -m where2edit_tpu.cli.mapper_inference ↔ mapper/scripts/inference.py
"""
