import time, numpy as np, jax, jax.numpy as jnp
E, nd, dim = 663552, 10, 912673
key = jax.random.PRNGKey(0)
Ae = jax.random.normal(key, (E, nd, nd), jnp.float32)
dofs = jax.random.randint(key, (E, nd), 0, dim, jnp.int32)
x = jax.random.normal(key, (dim,), jnp.float32)
flat = jnp.ravel(dofs)
perm = jnp.argsort(flat)
sortedr = flat[perm]
jax.block_until_ready((Ae, dofs, x, perm, sortedr))

def timeit(name, f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(*a)
    jax.block_until_ready(r)
    print(name, (time.perf_counter()-t0)/10, flush=True)

timeit("gather     ", jax.jit(lambda x: x[dofs]), x)
xe = x[dofs]; jax.block_until_ready(xe)
timeit("einsum     ", jax.jit(lambda xe: jnp.einsum("eij,ej->ei", Ae, xe)), xe)
ye = jnp.einsum("eij,ej->ei", Ae, xe); jax.block_until_ready(ye)
timeit("scatter-add", jax.jit(lambda ye: jnp.zeros(dim, ye.dtype).at[flat].add(ye.ravel())), ye)
timeit("segsum-sort", jax.jit(lambda ye: jax.ops.segment_sum(ye.ravel()[perm], sortedr, num_segments=dim, indices_are_sorted=True)), ye)
timeit("full-sorted", jax.jit(lambda x: jax.ops.segment_sum(jnp.einsum("eij,ej->ei", Ae, x[dofs]).ravel()[perm], sortedr, num_segments=dim, indices_are_sorted=True)), x)
timeit("full-unsort", jax.jit(lambda x: jnp.zeros(dim, x.dtype).at[flat].add(jnp.einsum("eij,ej->ei", Ae, x[dofs]).ravel())), x)
