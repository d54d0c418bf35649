"""Task assembly: YAML config -> data + model + trainer (AbsTask shape)."""
