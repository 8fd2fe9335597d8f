#!/usr/bin/env python
"""Launcher for reid_tpu.cli.gan_main (reference entry point: synthetic_main.py)."""
from reid_tpu.cli import gan_main

if __name__ == "__main__":
    gan_main()
