"""Engine scalar-function helpers: reference-compat semantics, stable
cross-engine hashing, and vector math on array columns."""
