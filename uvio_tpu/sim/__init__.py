from .simulator import SimCamera, SimParams, Simulator, circle_trajectory, load_tum_trajectory

__all__ = [
    "SimCamera",
    "SimParams",
    "Simulator",
    "circle_trajectory",
    "load_tum_trajectory",
]
