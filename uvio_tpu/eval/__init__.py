from .traj import ate, intersect, load_tum, nees, rpe, save_tum, umeyama_align

__all__ = ["ate", "intersect", "load_tum", "nees", "rpe", "save_tum", "umeyama_align"]
