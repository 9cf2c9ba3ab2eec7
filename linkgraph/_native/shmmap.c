/* LD_PRELOAD shim: back large allocations with pooled MAP_SHARED
 * anonymous memory.
 *
 * Motivation (measured on this virtualized host, BASELINE.md "fault
 * study"): first-touch of MAP_PRIVATE|MAP_ANONYMOUS pages faults at
 * ~7 MB/s (nested-paging path) while MAP_SHARED|MAP_ANONYMOUS (shmem)
 * pages fault at ~1.4 GB/s -- a ~200x asymmetry.  glibc backs every
 * large malloc with private-anon mmap through an internal,
 * non-interposable call, so all numpy/Arrow scratch paid the slow path
 * on first touch (e.g. a 1 GB numpy fill: 181 s -> 0.8 s under this
 * shim).
 *
 * Design:
 *  - malloc/calloc/realloc/free/memalign family interposed; sizes >=
 *    SHMMAP_MIN (default 4 MB) are served from MAP_SHARED|MAP_ANONYMOUS
 *    mappings with a 64-byte header; smaller sizes fall through to
 *    __libc_*.
 *  - freed mappings are POOLED (per process, exact-size match, capped
 *    at SHMMAP_POOL bytes, default 2 GB): iterative kernels re-request
 *    the same temporary sizes every round, so steady-state reuse avoids
 *    both the munmap/mmap churn and any refaulting -- the same warm-
 *    heap effect glibc's M_MMAP_THRESHOLD tuning gave, minus the slow
 *    first touch.
 *  - mmap() itself is also interposed for big RW private-anon requests
 *    from non-glibc allocators that call through the PLT (pyarrow's
 *    bundled jemalloc, OpenBLAS buffers).
 *
 * Shared-anon differs from private-anon only across fork (children
 * share the pages).  Ray's process tree is fork+exec with no parent-
 * heap writes in the window; do NOT preload around fork-no-exec pools.
 */
#define _GNU_SOURCE
#include <errno.h>
#include <dlfcn.h>
#include <pthread.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/syscall.h>
#include <unistd.h>

size_t malloc_usable_size(void *);

extern void *__libc_malloc(size_t);
extern void __libc_free(void *);
extern void *__libc_calloc(size_t, size_t);
extern void *__libc_realloc(void *, size_t);
extern void *__libc_memalign(size_t, size_t);

#define MAGIC 0x53484d4d41524541UL /* "SHMMAREA" */
#define HDR 64                     /* user pointer = page start + 64 */
#define POOL_SLOTS 256

typedef struct {
    unsigned long magic;
    size_t total; /* mapping length */
    size_t user;  /* requested size */
} hdr_t;

static size_t min_len = 4UL << 20;
static size_t pool_cap = 4UL << 30;
static int inited = 0;

static struct {
    void *addr;
    size_t total;
} pool[POOL_SLOTS];
static size_t pool_bytes = 0;
static pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;

static void ini(void) {
    const char *e = getenv("SHMMAP_MIN");
    if (e) {
        long v = atol(e);
        if (v > 0) min_len = (size_t)v;
    }
    e = getenv("SHMMAP_POOL");
    if (e) {
        long v = atol(e);
        if (v >= 0) pool_cap = (size_t)v;
    }
    inited = 1;
}

static void *sys_mmap(void *a, size_t l, int p, int f, int fd, long off) {
    long r = syscall(SYS_mmap, a, l, p, f, fd, off);
    return (r == -1) ? MAP_FAILED : (void *)r;
}

/* Round a mapping length up to a size class (quarter-octave: 1.0,
 * 1.25, 1.5, 1.75 x 2^k — waste <= 25%).  Kernel round temporaries
 * vary slightly in size run to run; without classing, every request
 * misses the pool and the resulting concurrent shmem mmap/munmap
 * churn serializes in the kernel (observed: actor stime ~10x utime). */
static size_t size_class(size_t total) {
    size_t base = 4096;
    while ((base << 1) <= total)
        base <<= 1;
    size_t q = base >> 2;
    size_t r = base;
    while (r < total)
        r += q;
    return r;
}

/* want_zero: caller needs zeroed bytes (calloc); pooled mappings are
 * dirty and get an explicit (warm, fast) memset. */
static void *big_alloc(size_t n, int want_zero) {
    size_t total = size_class((n + HDR + 4095) & ~4095UL);
    void *p = 0;
    pthread_mutex_lock(&mu);
    for (int i = 0; i < POOL_SLOTS; i++) {
        if (pool[i].addr && pool[i].total == total) {
            p = pool[i].addr;
            pool[i].addr = 0;
            pool_bytes -= total;
            break;
        }
    }
    pthread_mutex_unlock(&mu);
    if (p) {
        if (want_zero)
            memset((char *)p + HDR, 0, n);
    } else {
        p = sys_mmap(0, total, PROT_READ | PROT_WRITE,
                     MAP_SHARED | MAP_ANONYMOUS, -1, 0);
        if (p == MAP_FAILED)
            return 0;
    }
    hdr_t *h = (hdr_t *)p;
    h->magic = MAGIC;
    h->total = total;
    h->user = n;
    return (char *)p + HDR;
}

static void big_free(hdr_t *h) {
    size_t total = h->total;
    h->magic = 0;
    pthread_mutex_lock(&mu);
    if (pool_bytes + total <= pool_cap) {
        for (int i = 0; i < POOL_SLOTS; i++) {
            if (!pool[i].addr) {
                pool[i].addr = h;
                pool[i].total = total;
                pool_bytes += total;
                pthread_mutex_unlock(&mu);
                return;
            }
        }
    }
    pthread_mutex_unlock(&mu);
    syscall(SYS_munmap, h, total);
}

static hdr_t *get_hdr(void *p) {
    if (!p || (((unsigned long)p) & 4095UL) != HDR)
        return 0;
    hdr_t *h = (hdr_t *)((char *)p - HDR);
    return h->magic == MAGIC ? h : 0;
}

void *malloc(size_t n) {
    if (!inited) ini();
    if (n >= min_len) {
        void *p = big_alloc(n, 0);
        if (p) return p;
    }
    return __libc_malloc(n);
}

void free(void *p) {
    hdr_t *h = get_hdr(p);
    if (h) {
        big_free(h);
        return;
    }
    __libc_free(p);
}

void *calloc(size_t a, size_t b) {
    if (!inited) ini();
    if (b && a > (size_t)-1 / b) {
        errno = ENOMEM;
        return 0;
    }
    size_t n = a * b;
    if (n >= min_len) {
        void *p = big_alloc(n, 1);
        if (p) return p;
    }
    return __libc_calloc(a, b);
}

void *realloc(void *p, size_t n) {
    if (!inited) ini();
    hdr_t *h = get_hdr(p);
    if (h) {
        if (n + HDR <= h->total) {
            h->user = n;
            return p;
        }
        void *q = (n >= min_len) ? big_alloc(n, 0) : __libc_malloc(n);
        if (!q) return 0;
        memcpy(q, p, h->user < n ? h->user : n);
        big_free(h);
        return q;
    }
    if (p && n >= min_len) {
        void *q = big_alloc(n, 0);
        if (q) {
            size_t old = malloc_usable_size(p);
            memcpy(q, p, old < n ? old : n);
            __libc_free(p);
            return q;
        }
    }
    return __libc_realloc(p, n);
}

void *memalign(size_t align, size_t n) {
    if (!inited) ini();
    if (n >= min_len && align && HDR % align == 0) {
        void *p = big_alloc(n, 0);
        if (p) return p;
    }
    return __libc_memalign(align, n);
}

int posix_memalign(void **out, size_t align, size_t n) {
    if (!inited) ini();
    if (n >= min_len && align && HDR % align == 0) {
        void *p = big_alloc(n, 0);
        if (p) {
            *out = p;
            return 0;
        }
    }
    void *p = __libc_memalign(align, n);
    if (!p) return ENOMEM;
    *out = p;
    return 0;
}

void *aligned_alloc(size_t align, size_t n) {
    return memalign(align, n);
}

size_t malloc_usable_size(void *p) {
    hdr_t *h = get_hdr(p);
    if (h)
        return h->total - HDR;
    static size_t (*real)(void *) = 0;
    if (!real)
        real = (size_t(*)(void *))dlsym(RTLD_NEXT, "malloc_usable_size");
    return real ? real(p) : 0;
}

void *mmap(void *addr, size_t length, int prot, int flags, int fd,
           long offset) {
    if (!inited) ini();
    if (length >= min_len && fd < 0 && (flags & MAP_ANONYMOUS)
        && (flags & MAP_PRIVATE) && prot == (PROT_READ | PROT_WRITE)
        && !(flags & MAP_FIXED)) {
        void *p = sys_mmap(addr, length, prot,
                           (flags & ~MAP_PRIVATE) | MAP_SHARED, fd, offset);
        if (p != MAP_FAILED)
            return p;
    }
    return sys_mmap(addr, length, prot, flags, fd, offset);
}
