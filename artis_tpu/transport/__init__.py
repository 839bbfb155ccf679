"""Batched SoA packet transport: the TPU replacement for the reference's
per-packet recursion (update_packets.cc, rpkt.cc, gammapkt.cc, kpkt.cc)."""
