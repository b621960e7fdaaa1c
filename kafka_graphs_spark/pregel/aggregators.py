"""Named global aggregators for Pregel computations.

Reference: io/kgraph/pregel/aggregators/*.java — 10 built-ins (Boolean
And/Or, Double & Long Max/Min/Product/Sum), registered by name in
ComputeFunction.init (ComputeFunction.java:101-119), merged across
partitions at the superstep barrier (PregelComputation.java:581-607), and
readable by every vertex in the NEXT superstep. ``persistent`` carries the
value across supersteps instead of resetting (Aggregator.java:21-30).

Spark mapping: per-vertex contributions become a ``map<string,double>``
column on the compute output; the merge is one distributed aggregation per
superstep (partial-aggregatable, so the 100 TB path is a map-side combine
followed by a tiny driver collect). Boolean aggregators are encoded 0/1;
product is reduced directly. Non-numeric aggregators (the reference's
Kryo-opaque KMeans-center style) are intentionally out of scope of the
generic runtime — those algorithms use native DataFrame aggregations.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

# name -> (python reduce over iterable, identity for reset)
AGGREGATOR_OPS = {
    "sum": (lambda xs: sum(xs), 0.0),
    "min": (lambda xs: min(xs), math.inf),
    "max": (lambda xs: max(xs), -math.inf),
    "product": (lambda xs: math.prod(xs), 1.0),
    "and": (lambda xs: float(all(x != 0 for x in xs)), 1.0),
    "or": (lambda xs: float(any(x != 0 for x in xs)), 0.0),
}


@dataclass
class Aggregator:
    """Declaration of one named aggregator.

    op: one of ``AGGREGATOR_OPS`` keys.
    persistent: keep the reduced value across supersteps (reference
        ComputeFunction.java:110-119 registerPersistentAggregator);
        non-persistent aggregators reset to the identity each superstep.
    initial: starting value (defaults to the op identity).
    """

    op: str
    persistent: bool = False
    initial: Optional[float] = None
    value: float = field(init=False, default=0.0)

    def __post_init__(self):
        if self.op not in AGGREGATOR_OPS:
            raise ValueError(f"unknown aggregator op {self.op!r}; choose from {sorted(AGGREGATOR_OPS)}")
        self.value = self.initial if self.initial is not None else AGGREGATOR_OPS[self.op][1]

    def reset(self) -> None:
        if not self.persistent:
            self.value = self.initial if self.initial is not None else AGGREGATOR_OPS[self.op][1]

    def merge(self, contribution: float) -> None:
        reduce_fn, _ = AGGREGATOR_OPS[self.op]
        self.value = reduce_fn([self.value, contribution])
