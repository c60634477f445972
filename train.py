#!/usr/bin/env python
"""Convenience wrapper: ``python train.py --cfg ...`` == the reference's CLI."""
from gomavatar_tpu.cli.train import main

if __name__ == "__main__":
    main()
