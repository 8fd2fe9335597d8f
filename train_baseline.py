#!/usr/bin/env python
"""Launcher for reid_tpu.cli.lsro_main (reference entry point: gan/train_baseline.py)."""
from reid_tpu.cli import lsro_main

if __name__ == "__main__":
    lsro_main()
