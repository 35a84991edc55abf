"""Ray Data stages: batch transforms, actor pools, groupby merges."""
