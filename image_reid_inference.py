#!/usr/bin/env python
"""Launcher for reid_tpu.cli.inference_main (reference entry point: image_reid_inference.py)."""
from reid_tpu.cli import inference_main

if __name__ == "__main__":
    inference_main()
