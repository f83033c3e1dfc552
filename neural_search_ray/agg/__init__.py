"""Distributed aggregation primitives: mergeable sketches (HyperLogLog,
t-digest) and the Ray-Data exact/approximate aggregation pipelines built
on them."""
