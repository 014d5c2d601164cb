"""Multi-chip / multi-host execution: mesh config, sharded search,
distributed NTT, hand-written ICI kernels (SURVEY.md §2.3)."""
