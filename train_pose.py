#!/usr/bin/env python
"""Convenience wrapper: ``python train_pose.py --cfg ...`` == the reference's
PeopleSnapshot test-time pose refinement CLI."""
from gomavatar_tpu.cli.train_pose import main

if __name__ == "__main__":
    main()
