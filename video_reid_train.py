#!/usr/bin/env python
"""Launcher for reid_tpu.cli.video_main (reference entry point: video_reid_train.py)."""
from reid_tpu.cli import video_main

if __name__ == "__main__":
    video_main()
