"""Host-side utilities: RNG discipline, image IO, CLI, logging."""
