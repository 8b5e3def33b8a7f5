from .layout import StateLayout
from .state import FilterState, init_state, num_clones, oldest_clone_slot

__all__ = ["StateLayout", "FilterState", "init_state", "num_clones", "oldest_clone_slot"]
