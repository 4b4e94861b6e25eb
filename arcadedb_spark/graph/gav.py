"""Graph Analytical Views: named, materialized edge representations.

Reference: engine/src/main/java/com/arcadedb/graph/olap/
{GraphAnalyticalView,CSRBuilder,DeltaOverlay}.java — a CSR adjacency +
columnar property store built per edge-type set, with a delta overlay
collecting post-build writes and compaction folding them in.

Spark re-expression: the CSR analog is the selected edge frame
repartitioned by src and sorted within partitions (so every out()-
expansion equi-joins without reshuffling the edge side), materialized
via cache.  The delta overlay is positional: the graph model appends
edge frames per write, so the frames added after the build ARE the
delta — `edges()` unions them on read when the update mode is
SYNCHRONOUS, and `rebuild()` folds them into a fresh sorted base
(the compaction analog).

At cluster scale the same program writes the sorted frame to a bucketed
table instead of caching; the read path is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GraphAnalyticalView:
    name: str
    edge_types: tuple[str, ...]  # empty = all edge types
    vertex_types: tuple[str, ...] = ()
    properties: tuple[str, ...] = ()  # vertex props kept (empty = all)
    edge_properties: tuple[str, ...] = ()  # edge props kept (empty = all)
    update_mode: str = "OFF"  # OFF | SYNCHRONOUS (reference UpdateMode)
    compaction_threshold: int = -1
    _base: DataFrame | None = field(default=None, repr=False)
    _delta_mark: int = 0  # index into the model's edge-frame list
    _edge_count: int = 0
    _builds: int = 0

    def _select_cols(self, df: DataFrame) -> DataFrame:
        if self.edge_properties:
            keep = ["etype", "src", "dst"] + [
                c for c in self.edge_properties if c in df.columns
            ]
            df = df.select(*keep)
        return df

    def _source(self, g) -> DataFrame:
        return self._select_cols(
            g.edges(*self.edge_types) if self.edge_types else g.edges()
        )

    def build(self, g) -> int:
        """(Re)build the sorted materialized base — CSRBuilder.build().
        Folds any pending delta frames in (the compaction analog)."""
        if self._base is not None:
            self._base.unpersist()
        base = (
            self._source(g)
            .repartition("src")
            .sortWithinPartitions("src")
            .cache()
        )
        self._edge_count = base.count()  # materialize
        g._flush_edges()
        self._delta_mark = len(g._edge_dfs)
        self._base = base
        self._builds += 1
        return self._edge_count

    def _delta(self, g) -> DataFrame | None:
        """Edge frames appended after the last build, filtered to this
        view's edge types (DeltaOverlay analog)."""
        g._flush_edges()
        frames = g._edge_dfs[self._delta_mark:]
        out = None
        for df in frames:
            part = df
            if self.edge_types:
                part = part.filter(F.col("etype").isin(list(self.edge_types)))
            part = self._select_cols(part)
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        return out

    def edges(self, g) -> DataFrame:
        """The view's edge frame.  SYNCHRONOUS mode overlays post-build
        deltas so readers see fresh writes; OFF serves the build-time
        snapshot until REBUILD."""
        if self._base is None:
            raise ValueError(f"GAV '{self.name}' has not been built")
        if self.update_mode != "SYNCHRONOUS":
            return self._base
        delta = self._delta(g)
        if delta is None:
            return self._base
        return self._base.unionByName(delta, allowMissingColumns=True)

    def stats(self, g) -> dict:
        g._flush_edges()
        return {
            "name": self.name,
            "edge_types": ",".join(self.edge_types) or "*",
            "update_mode": self.update_mode,
            "edge_count": self._edge_count,
            "delta_frames": len(g._edge_dfs) - self._delta_mark,
            "builds": self._builds,
        }
