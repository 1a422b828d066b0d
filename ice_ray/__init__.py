"""ice_ray — a Ray-Data-native knowledge-graph construction engine.

Reimplements the computational content of NYU ICE (rgrishman/ice) as
idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches of conversation turns, stateful stages as actor
pools, wide steps as groupby/aggregate/sort, and a deduplicated
(subj, pred, obj) edge table hash-partitioned by subject.

Never calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
