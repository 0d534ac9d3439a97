"""Experiment-grid orchestration: the engine's equivalent of the
reference's ``Workflow`` / ``workflow_from_config``."""
