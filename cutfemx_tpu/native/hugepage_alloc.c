/* NumPy data allocator backed by 2MB-aligned anonymous mmap with
 * MADV_HUGEPAGE and a never-unmapping size-bucket free list.
 *
 * Why: this build target runs in a microVM with on-demand paging where
 * 4 KiB first-touch faults run at ~15-45 MB/s, so every large NumPy
 * temporary (glibc mmaps them and munmaps on free) stalls for seconds.
 * Transparent huge pages fault ~30x faster (measured 1.2-1.8 GB/s), and
 * recycling freed blocks makes steady-state allocations fault-free.
 *
 * Design:
 *   - allocations >= SMALL_LIMIT come from 2MB-aligned mmap chunks,
 *     rounded up to power-of-two buckets, madvise(MADV_HUGEPAGE)d once;
 *     freed blocks go to a per-bucket LIFO free list and are never
 *     munmapped (pages stay resident and warm).
 *   - smaller allocations fall through to malloc/calloc/realloc/free.
 *   - a fixed open-addressing hash table maps live large pointers to
 *     their bucket so realloc/free can tell the two populations apart.
 *   - a pthread mutex guards the free lists + table (NumPy may allocate
 *     without the GIL from C threads).
 *
 * This replaces no reference component; it is host-runtime infrastructure
 * for the TPU build (the reference's MPI ranks each own a slab small
 * enough not to hit this class of problem).
 */
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>

#define TWO_MB ((size_t)2 << 20)
#define SMALL_LIMIT ((size_t)1 << 20)
#define NBUCKETS 26 /* 1MB << 25 = 32TB ceiling */

#ifndef MADV_HUGEPAGE
#define MADV_HUGEPAGE 14
#endif
#ifndef MADV_POPULATE_WRITE
#define MADV_POPULATE_WRITE 23
#endif

static void *freelist[NBUCKETS];
static pthread_mutex_t lock = PTHREAD_MUTEX_INITIALIZER;

/* live large-pointer table: open addressing, power-of-two capacity */
typedef struct {
  uintptr_t ptr;
  int bucket; /* -1 = empty, -2 = tombstone */
} slot_t;
static slot_t *table = NULL;
static size_t table_cap = 0, table_live = 0;

static size_t hash_ptr(uintptr_t p, size_t cap) {
  p >>= 12;
  p *= 0x9e3779b97f4a7c15ULL;
  return (size_t)(p >> 32) & (cap - 1);
}

static int table_grow(void);

static int table_put(uintptr_t p, int bucket) {
  if (table_live * 10 >= table_cap * 7)
    if (table_grow() != 0) return -1;
  size_t i = hash_ptr(p, table_cap);
  while (table[i].bucket >= 0) i = (i + 1) & (table_cap - 1);
  table[i].ptr = p;
  table[i].bucket = bucket;
  table_live++;
  return 0;
}

static int table_take(uintptr_t p) {
  if (!table_cap) return -1;
  size_t i = hash_ptr(p, table_cap);
  while (table[i].bucket != -1) {
    if (table[i].bucket >= 0 && table[i].ptr == p) {
      int b = table[i].bucket;
      table[i].bucket = -2;
      table_live--;
      return b;
    }
    i = (i + 1) & (table_cap - 1);
  }
  return -1;
}

static int table_grow(void) {
  size_t ncap = table_cap ? table_cap * 2 : 4096;
  slot_t *nt = malloc(ncap * sizeof(slot_t));
  if (!nt) return -1;
  for (size_t i = 0; i < ncap; i++) nt[i].bucket = -1;
  if (table) {
    for (size_t i = 0; i < table_cap; i++)
      if (table[i].bucket >= 0) {
        size_t j = hash_ptr(table[i].ptr, ncap);
        while (nt[j].bucket >= 0) j = (j + 1) & (ncap - 1);
        nt[j] = table[i];
      }
    free(table);
  }
  table = nt;
  table_cap = ncap;
  return 0;
}

static int bucket_for(size_t n) {
  int b = 0;
  size_t s = SMALL_LIMIT;
  while (s < n && b < NBUCKETS - 1) {
    s <<= 1;
    b++;
  }
  return b;
}

static size_t bucket_size(int b) { return SMALL_LIMIT << b; }

/* returns an aligned block of bucket_size(b), hashed as live; NULL on OOM */
static void *big_alloc(int b) {
  pthread_mutex_lock(&lock);
  void *p = freelist[b];
  if (p) {
    freelist[b] = *(void **)p;
    if (table_put((uintptr_t)p, b) != 0) {
      *(void **)p = freelist[b];
      freelist[b] = p;
      p = NULL;
    }
    pthread_mutex_unlock(&lock);
    return p;
  }
  pthread_mutex_unlock(&lock);

  size_t sz = bucket_size(b);
  size_t map = sz + TWO_MB;
  char *raw = mmap(NULL, map, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  if (raw == MAP_FAILED) return NULL;
  uintptr_t base = ((uintptr_t)raw + TWO_MB - 1) & ~(TWO_MB - 1);
  if ((char *)base != raw) munmap(raw, base - (uintptr_t)raw);
  size_t tail = (uintptr_t)raw + map - (base + sz);
  if (tail) munmap((char *)base + sz, tail);
  madvise((void *)base, sz, MADV_HUGEPAGE);
  /* Populate eagerly: one batched kernel path instead of per-page
   * demand faults. Wins in both paging regimes of this microVM — on a
   * cold snapshot the backend requests batch (vs one uffd round trip
   * per fault), and on a warm guest it skips the per-touch THP
   * allocation/compaction stalls measured at ~6-16 MB/s (bulk populate
   * measured 1.2-2.4 GB/s). Harmless where unsupported (EINVAL). */
  madvise((void *)base, sz, MADV_POPULATE_WRITE);

  pthread_mutex_lock(&lock);
  int rc = table_put(base, b);
  pthread_mutex_unlock(&lock);
  if (rc != 0) {
    munmap((void *)base, sz);
    return NULL;
  }
  return (void *)base;
}

static void big_free(void *p, int b) {
  pthread_mutex_lock(&lock);
  *(void **)p = freelist[b];
  freelist[b] = p;
  pthread_mutex_unlock(&lock);
}

/* ---- PyDataMem_Handler hooks ------------------------------------------- */

static void *hp_malloc(void *ctx, size_t size) {
  (void)ctx;
  if (size < SMALL_LIMIT) return malloc(size);
  return big_alloc(bucket_for(size));
}

static void *hp_calloc(void *ctx, size_t nelem, size_t elsize) {
  (void)ctx;
  size_t size = nelem * elsize;
  if (elsize && size / elsize != nelem) return NULL; /* overflow */
  if (size < SMALL_LIMIT) return calloc(nelem, elsize);
  void *p = big_alloc(bucket_for(size));
  if (p) memset(p, 0, size); /* recycled blocks are dirty */
  return p;
}

static void hp_free(void *ctx, void *ptr, size_t size) {
  (void)ctx;
  (void)size;
  if (!ptr) return;
  pthread_mutex_lock(&lock);
  int b = table_take((uintptr_t)ptr);
  pthread_mutex_unlock(&lock);
  if (b < 0) {
    free(ptr);
    return;
  }
  big_free(ptr, b);
}

static void *hp_realloc(void *ctx, void *ptr, size_t new_size) {
  (void)ctx;
  if (!ptr) return hp_malloc(NULL, new_size);
  pthread_mutex_lock(&lock);
  int b = table_take((uintptr_t)ptr);
  if (b >= 0 && new_size <= bucket_size(b) && new_size >= SMALL_LIMIT) {
    /* still fits its bucket: keep the block */
    int rc = table_put((uintptr_t)ptr, b);
    pthread_mutex_unlock(&lock);
    return rc == 0 ? ptr : NULL;
  }
  pthread_mutex_unlock(&lock);
  if (b < 0) {
    /* system-owned block */
    if (new_size < SMALL_LIMIT) return realloc(ptr, new_size);
    void *np_ = big_alloc(bucket_for(new_size));
    if (!np_) return NULL;
    /* old size unknown but < SMALL_LIMIT (it was system-owned and numpy
     * shrink-reallocs are rare); copying SMALL_LIMIT-capped prefix is not
     * safe in general, so use realloc to learn nothing... instead: the
     * old block was malloc'd with some size < SMALL_LIMIT only if it was
     * allocated via hp_malloc's small path. Copy that upper bound. */
    void *grown = realloc(ptr, new_size); /* moves data correctly */
    if (!grown) {
      big_free(np_, bucket_for(new_size));
      return NULL;
    }
    memcpy(np_, grown, new_size < SMALL_LIMIT ? new_size : SMALL_LIMIT);
    /* data beyond the old size is undefined per realloc contract; numpy
     * only relies on the old-size prefix, which was < SMALL_LIMIT */
    free(grown);
    return np_;
  }
  /* our block, moving */
  size_t old_sz = bucket_size(b);
  if (new_size < SMALL_LIMIT) {
    void *small = malloc(new_size);
    if (!small) {
      pthread_mutex_lock(&lock);
      table_put((uintptr_t)ptr, b);
      pthread_mutex_unlock(&lock);
      return NULL;
    }
    memcpy(small, ptr, new_size);
    big_free(ptr, b);
    return small;
  }
  void *np_ = big_alloc(bucket_for(new_size));
  if (!np_) {
    pthread_mutex_lock(&lock);
    table_put((uintptr_t)ptr, b);
    pthread_mutex_unlock(&lock);
    return NULL;
  }
  memcpy(np_, ptr, new_size < old_sz ? new_size : old_sz);
  big_free(ptr, b);
  return np_;
}

static PyDataMem_Handler hp_handler = {
    "cutfemx_hugepage_allocator",
    1,
    {
        NULL, /* ctx */
        hp_malloc,
        hp_calloc,
        hp_realloc,
        hp_free,
    },
};

static PyObject *install(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  PyObject *cap =
      PyCapsule_New(&hp_handler, "mem_handler", NULL);
  if (!cap) return NULL;
  PyObject *old = PyDataMem_SetHandler(cap);
  Py_DECREF(cap);
  if (!old) return NULL;
  Py_DECREF(old);
  Py_RETURN_NONE;
}

static PyObject *pool_stats(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  size_t cached = 0, live = 0;
  pthread_mutex_lock(&lock);
  for (int b = 0; b < NBUCKETS; b++)
    for (void *p = freelist[b]; p; p = *(void **)p)
      cached += bucket_size(b);
  live = table_live;
  pthread_mutex_unlock(&lock);
  return Py_BuildValue("{s:n,s:n}", "cached_bytes", (Py_ssize_t)cached,
                       "live_blocks", (Py_ssize_t)live);
}

static PyMethodDef methods[] = {
    {"install", install, METH_NOARGS,
     "Install the hugepage-backed NumPy data allocator."},
    {"pool_stats", pool_stats, METH_NOARGS,
     "Free-list cache statistics."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hugepage_alloc",
    "Hugepage-backed NumPy allocator for microVM hosts.", -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__hugepage_alloc(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
