#!/usr/bin/env python
"""Launcher for reid_tpu.cli.train_main (reference entry point: image_reid_train.py)."""
from reid_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
