from .fake_sim import FakeSim, BoxScene, ReplaySim

__all__ = ["FakeSim", "BoxScene", "ReplaySim"]
