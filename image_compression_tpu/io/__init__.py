"""Host-side I/O: PNG load/save, byte-compatible metadata codec, slice
writing, and lossless reassembly. A native C++ fast path (see native/) backs
the hot host loops; pure-Python implementations are the reference behavior."""
