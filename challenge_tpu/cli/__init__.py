"""CLI entry points preserving the reference's argparse surfaces
(reference: sj_train.py, trainer.py, eval.py, get_csv_data.py)."""
