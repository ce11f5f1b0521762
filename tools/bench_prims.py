"""Microbench: row fetch/write primitives on [B, T, A] tree arrays.

Verifies which indexing strategy is fastest on the actual TPU for the
search's hot access patterns (select row fetch, expand row write,
state gather). Round-1/2 chose one-hot matmuls / masked reductions on the
claim that vmapped dynamic indexing serializes — re-measured here.
"""
import os, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = int(os.environ.get("B", "1024"))
T = int(os.environ.get("T", "201"))
A = int(os.environ.get("A", "82"))

key = jax.random.PRNGKey(0)
arr = jax.random.normal(key, (B, T, A), jnp.float32)
vec = jax.random.normal(key, (B, T), jnp.float32)
boards = jax.random.randint(key, (B, T, 81), 0, 3, jnp.int8)
idx = jax.random.randint(key, (B,), 0, T, jnp.int32)
row = jax.random.normal(key, (B, A), jnp.float32)

def timeit(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:45s} {dt:8.3f} ms")
    return dt

print(f"B={B} T={T} A={A}")

# --- row fetch from [B,T,A] ---
def fetch_onehot(arr, idx):
    oh = (jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]).astype(jnp.float32)
    return jnp.einsum("bt,bta->ba", oh, arr)

def fetch_take(arr, idx):
    return jnp.take_along_axis(arr, idx[:, None, None], axis=1)[:, 0]

def fetch_mask(arr, idx):
    oh = jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.where(oh[:, :, None], arr, 0.0).sum(1)

def fetch_dus(arr, idx):
    def one(a, i):
        return jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)[0]
    return jax.vmap(one)(arr, idx)

timeit("fetch row [B,T,A]: onehot einsum", fetch_onehot, arr, idx)
timeit("fetch row [B,T,A]: take_along_axis", fetch_take, arr, idx)
timeit("fetch row [B,T,A]: masked reduce", fetch_mask, arr, idx)
timeit("fetch row [B,T,A]: vmap dynamic_slice", fetch_dus, arr, idx)

# --- row write to [B,T,A] ---
def write_where(arr, idx, row):
    oh = jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.where(oh[:, :, None], row[:, None, :], arr)

def write_dus(arr, idx, row):
    def one(a, i, r):
        return jax.lax.dynamic_update_slice_in_dim(a, r[None], i, axis=0)
    return jax.vmap(one)(arr, idx, row)

def write_scatter(arr, idx, row):
    return arr.at[jnp.arange(B), idx].set(row)

timeit("write row [B,T,A]: onehot where", write_where, arr, idx, row)
timeit("write row [B,T,A]: vmap dyn_update_slice", write_dus, arr, idx, row)
timeit("write row [B,T,A]: .at[b, idx].set", write_scatter, arr, idx, row)

# --- int8 board gather [B,T,81] ---
def bfetch_take(boards, idx):
    return jnp.take_along_axis(boards, idx[:, None, None], axis=1)[:, 0]

def bfetch_mask(boards, idx):
    oh = jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.where(oh[:, :, None], boards, 0).sum(1, dtype=jnp.int32).astype(jnp.int8)

timeit("fetch board [B,T,81] i8: take_along_axis", bfetch_take, boards, idx)
timeit("fetch board [B,T,81] i8: masked reduce", bfetch_mask, boards, idx)

# --- board write (i8) ---
browi8 = jax.random.randint(key, (B, 81), 0, 3, jnp.int8)
def bwrite_where(boards, idx, r):
    oh = jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.where(oh[:, :, None], r[:, None, :], boards)

def bwrite_dus(boards, idx, r):
    def one(a, i, rr):
        return jax.lax.dynamic_update_slice_in_dim(a, rr[None], i, axis=0)
    return jax.vmap(one)(boards, idx, r)

timeit("write board [B,T,81] i8: onehot where", bwrite_where, boards, idx, browi8)
timeit("write board [B,T,81] i8: vmap dus", bwrite_dus, boards, idx, browi8)

# --- element fetch from [B,T] ---
def efetch_onehot(vec, idx):
    oh = (jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]).astype(jnp.float32)
    return jnp.einsum("bt,bt->b", oh, vec)

def efetch_take(vec, idx):
    return jnp.take_along_axis(vec, idx[:, None], axis=1)[:, 0]

timeit("fetch elem [B,T]: onehot", efetch_onehot, vec, idx)
timeit("fetch elem [B,T]: take_along_axis", efetch_take, vec, idx)

# --- calibration: known-traffic ops ---
big = jax.random.normal(key, (B, T, A), jnp.float32)  # 67 MB
def add1(x):
    return x + 1.0
t = timeit("calib: [B,T,A] f32 +1 (134MB traffic)", add1, big)
print(f"  -> implied BW {2*big.nbytes/1e9/(t/1e3):.0f} GB/s")
big2 = jax.random.normal(key, (8*B, T, A), jnp.float32)  # 536 MB
t = timeit("calib: 8x[B,T,A] f32 +1 (1.07GB traffic)", add1, big2)
print(f"  -> implied BW {2*big2.nbytes/1e9/(t/1e3):.0f} GB/s")
def mask_reduce_big(x, idx):
    oh = jnp.arange(T, dtype=jnp.int32)[None, :] == idx[:, None]
    return jnp.where(oh[:, :, None], x, 0.0).sum(1)
idx8 = jax.random.randint(key, (8*B,), 0, T, jnp.int32)
t = timeit("calib: 8x masked reduce (536MB read)", mask_reduce_big, big2, idx8)
print(f"  -> implied read BW {big2.nbytes/1e9/(t/1e3):.0f} GB/s")
def take_big(x, idx):
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
t = timeit("calib: 8x take_along_axis (2.7MB touched)", take_big, big2, idx8)
