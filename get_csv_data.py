#!/usr/bin/env python
"""Entry-point shim: ``python get_csv_data.py --path <dir>``
(reference signature preserved; implementation in
challenge_tpu.cli.get_csv_data)."""
from challenge_tpu.cli.get_csv_data import main  # noqa: F401

if __name__ == '__main__':
    main()
