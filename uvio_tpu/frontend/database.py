"""Host-side feature track store.

Equivalent of `ov_core/src/feat/FeatureDatabase.{h,cpp}` + `Feature.h`:
id -> per-camera list of stamped uv observations, with the temporal
queries the manager's triage needs. This bookkeeping is deliberately
host-side (numpy scalars, dict ops at frame rate are negligible); the
device consumes padded track tensors built from it.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


class Feature:
    __slots__ = ("feat_id", "obs", "to_delete")

    def __init__(self, feat_id: int):
        self.feat_id = feat_id
        # cam_id -> list[(t, u, v)] (time-ordered)
        self.obs: Dict[int, List[Tuple[float, float, float]]] = {}
        self.to_delete = False

    def add(self, t: float, cam: int, u: float, v: float):
        self.obs.setdefault(cam, []).append((t, u, v))

    def times(self):
        ts = set()
        for lst in self.obs.values():
            ts.update(t for t, _, _ in lst)
        return ts

    def newest_time(self):
        return max((lst[-1][0] for lst in self.obs.values() if lst), default=-1.0)

    def oldest_time(self):
        return min((lst[0][0] for lst in self.obs.values() if lst), default=-1.0)

    def num_obs(self):
        return sum(len(lst) for lst in self.obs.values())

    def clean_older_than(self, t: float):
        """Remove measurements at times < t (clean_old_measurements)."""
        for c in list(self.obs.keys()):
            self.obs[c] = [o for o in self.obs[c] if o[0] >= t]
            if not self.obs[c]:
                del self.obs[c]


class FeatureDatabase:
    def __init__(self):
        self.features: Dict[int, Feature] = {}

    def update_feature(self, feat_id: int, t: float, cam: int, u: float, v: float):
        f = self.features.get(feat_id)
        if f is None:
            f = Feature(feat_id)
            self.features[feat_id] = f
        f.add(t, cam, u, v)

    def features_not_seen_at(self, t: float):
        """Lost tracks: newest obs strictly older than t
        (features_not_containing_newer semantics)."""
        return [f for f in self.features.values() if f.newest_time() < t]

    def features_seen_at(self, t: float):
        """Tracks with an observation at exactly time t
        (features_containing semantics)."""
        out = []
        for f in self.features.values():
            if any(abs(o[0] - t) < 1e-9 for lst in f.obs.values() for o in lst):
                out.append(f)
        return out

    def cleanup(self):
        self.features = {
            i: f for i, f in self.features.items() if not f.to_delete and f.num_obs() > 0
        }

    def cleanup_older_than(self, t: float):
        for f in self.features.values():
            f.clean_older_than(t)
        self.features = {i: f for i, f in self.features.items() if f.num_obs() > 0}

    def __len__(self):
        return len(self.features)

    # -- serialization (checkpoint/resume) --------------------------------
    def to_dict(self) -> dict:
        return {
            str(i): {str(c): lst for c, lst in f.obs.items()}
            for i, f in self.features.items()
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureDatabase":
        db = cls()
        for i, obs in d.items():
            f = Feature(int(i))
            f.obs = {int(c): [tuple(o) for o in lst] for c, lst in obs.items()}
            db.features[int(i)] = f
        return db
