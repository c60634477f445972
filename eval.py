#!/usr/bin/env python
"""Convenience wrapper: ``python eval.py --cfg ... --type view`` == the
reference's CLI."""
from gomavatar_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
