"""Registration pipelines: beads matching, intensity optimization, transform QC."""
