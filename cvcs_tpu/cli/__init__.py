"""CLI entry points mirroring the reference's script-per-task surface:

    python -m cvcs_tpu.cli.train     <config.yaml>   (reference train.py)
    python -m cvcs_tpu.cli.evaluate  <config.yaml>   (reference evaluation.py)
    python -m cvcs_tpu.cli.predict   <config.yaml>   (reference inference.py)
    python -m cvcs_tpu.cli.esa       <config.yaml>   (reference esa.py)

All accept the reference's YAML vocabulary (SURVEY §5)."""
