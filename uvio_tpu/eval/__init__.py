from .traj import ate, intersect, load_tum, nees, rpe, umeyama_align

__all__ = ["ate", "intersect", "load_tum", "nees", "rpe", "umeyama_align"]
