"""Incremental + streaming execution: checkpoint-resumable batch rollups
and the Structured Streaming continuous-aggregate path."""
