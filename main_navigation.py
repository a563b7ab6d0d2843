#!/usr/bin/env python
"""Frontier-only navigation entry point (reference main_navigation.py)."""
from fisher_nerf_customized_tpu.cli import main_navigation

if __name__ == "__main__":
    main_navigation()
