"""Signal-processing ops and losses (JAX/Pallas)."""
