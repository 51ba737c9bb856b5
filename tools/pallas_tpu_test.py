import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, grad, inner
from cutfemx_tpu.forms.measure import dx
from cutfemx_tpu.pallas_ops import BandedEllOperator

mesh = cfx.mesh.create_unit_square(64)
V = cfx.functionspace(mesh, ("Lagrange", 2))
u, v = TrialFunction(V), TestFunction(V)
A = fem.assemble_matrix(fem.form(inner(grad(u), grad(v))*dx + u*v*dx))
print("dofs:", V.dim, flush=True)
op = BandedEllOperator(A, block_rows=256, interpret=False)
print("bandwidth:", op.bandwidth, flush=True)
x = jnp.asarray(np.random.default_rng(0).standard_normal(V.dim), jnp.float32)
y = np.asarray(op(x))
y_ref = A.to_scipy() @ np.asarray(x, np.float64)
print("pallas TPU banded-ELL rel err:",
      np.abs(y - y_ref).max() / np.abs(y_ref).max(), flush=True)
t0 = time.perf_counter()
for _ in range(50):
    y2 = op(x)
jax.block_until_ready(y2)
print("pallas spmv avg:", (time.perf_counter()-t0)/50*1e3, "ms", flush=True)
# XLA reference: unsorted gather-scatter for comparison
m = A.to_scipy().tocsr()
data = jnp.asarray(m.data, jnp.float32)
cols = jnp.asarray(m.indices.astype(np.int32))
rows = jnp.asarray(np.repeat(np.arange(m.shape[0]), np.diff(m.indptr)).astype(np.int32))
@jax.jit
def csr_apply(x):
    return jax.ops.segment_sum(data * x[cols], rows, num_segments=m.shape[0],
                               indices_are_sorted=True)
y3 = csr_apply(x); jax.block_until_ready(y3)
t0 = time.perf_counter()
for _ in range(50):
    y3 = csr_apply(x)
jax.block_until_ready(y3)
print("xla csr avg:", (time.perf_counter()-t0)/50*1e3, "ms  nnz:", m.nnz,
      flush=True)
