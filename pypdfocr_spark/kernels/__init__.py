"""Pure-Python kernels (no Spark imports).

Each kernel reimplements the *semantics* of one reference stage
(citations in each module). They run both inside Arrow UDFs on executors
and standalone as the single-machine oracle for byte-identity tests.
"""
