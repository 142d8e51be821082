"""Multi-chip screen-band sharding over a jax device mesh (SURVEY.md §5.8)."""
