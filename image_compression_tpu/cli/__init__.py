"""Command-line entry points mirroring the reference's five binaries:
compress, reassemble, image_converter, pretraining, training
(CMakeLists.txt:43-176)."""
