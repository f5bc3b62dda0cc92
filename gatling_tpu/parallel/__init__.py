"""Multi-chip scaling: framebuffer-tile and spp sharding over a device mesh."""
