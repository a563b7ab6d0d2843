#!/usr/bin/env python
"""Active-mapping entry point (reference main.py analog).

Example:
    python main.py --slam_config configs/mp3d_gaussian_FR_eccv.yaml \
                   --scenes_list fake_room_0 --sim fake
"""
from fisher_nerf_customized_tpu.cli import main

if __name__ == "__main__":
    main()
