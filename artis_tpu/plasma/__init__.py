"""Per-cell plasma state solvers (LTE populations, radiation field, thermal
balance, NLTE, non-thermal), all vmap-batched over non-empty model cells."""
