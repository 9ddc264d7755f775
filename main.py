#!/usr/bin/env python
"""Thin launcher: ``python main.py [--synthetic] [key.path=value ...]``."""

from multimodal_av_model_tpu.main import main

if __name__ == "__main__":
    main()
