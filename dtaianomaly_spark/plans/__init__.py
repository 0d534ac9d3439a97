"""Physical-plan helpers: skew-aware partitioning and per-partition
lineage/metrics emission (north rule: every stage observable, skew
handled explicitly)."""
