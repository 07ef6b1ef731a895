"""Point-cloud visual models + splat renderer (the `pcd.json` ablation path)."""
