"""Sources: deterministic corpus generators and file-format readers."""
