"""Resume manifests and job-state gates (reference S9/S11/J4 analogs)."""
