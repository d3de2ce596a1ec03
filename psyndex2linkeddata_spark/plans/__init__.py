"""Staged logical plans: extract → normalize → link → emit → finalize."""
