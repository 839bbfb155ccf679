"""Host-side input parsing: model/abundance/atomic/decay/parameter files.

All parsers produce NumPy arrays (float64) on the host; conversion to device
arrays happens in the setup layer, never here.
"""
