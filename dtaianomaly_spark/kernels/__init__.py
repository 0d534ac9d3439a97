"""Pure-NumPy semantic kernels.

One implementation of every numeric semantic the engine promises, shared by
(a) the pytest oracle and (b) the vectorized Arrow UDFs that Spark executes.
No Spark imports allowed in this subpackage.
"""
