#!/usr/bin/env python
"""Launcher for reid_tpu.cli.track_main (reference entry point: track.py)."""
from reid_tpu.cli import track_main

if __name__ == "__main__":
    track_main()
