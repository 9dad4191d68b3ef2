// Java binding for the usearch_tpu engine over its C ABI (c/usearch_tpu.h).
//
// The reference ships a JNI binding (reference: java/cloud/unum/usearch/
// Index.java + C++ glue); this binding instead uses the Foreign Function &
// Memory API (JEP 454, Java 22+) so it is pure Java source over the same
// C ABI — no native glue layer to compile.
//
// Build: `make -C ../c libusearch_tpu.so`, then
//   java --enable-native-access=ALL-UNNAMED -Djava.library.path=../c ...
//
// NOTE: no Java toolchain ships in the development image this file was
// authored in; the binding is source-complete and mirrors the tested C
// smoke test (c/test.c) call-for-call, but has not itself been compiled.
package usearch.tpu;

import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemoryLayout;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;

/** One dense usearch_tpu index. AutoCloseable; use try-with-resources. */
public final class Index implements AutoCloseable {

    // ---- metric / scalar enums (c/usearch_tpu.h:27-49) ----
    public static final int METRIC_COS = 1, METRIC_IP = 2, METRIC_L2SQ = 3,
            METRIC_HAVERSINE = 4, METRIC_DIVERGENCE = 5, METRIC_PEARSON = 6,
            METRIC_JACCARD = 7, METRIC_HAMMING = 8, METRIC_TANIMOTO = 9,
            METRIC_SORENSEN = 10;
    public static final int SCALAR_F32 = 1, SCALAR_F64 = 2, SCALAR_F16 = 3,
            SCALAR_BF16 = 4, SCALAR_I8 = 5, SCALAR_B1 = 6;

    // usearch_init_options_t layout (c/usearch_tpu.h:57-66)
    private static final MemoryLayout OPTIONS = MemoryLayout.structLayout(
            ValueLayout.JAVA_INT.withName("metric_kind"),
            MemoryLayout.paddingLayout(4),
            ValueLayout.ADDRESS.withName("metric"),
            ValueLayout.JAVA_INT.withName("quantization"),
            MemoryLayout.paddingLayout(4),
            ValueLayout.JAVA_LONG.withName("dimensions"),
            ValueLayout.JAVA_LONG.withName("connectivity"),
            ValueLayout.JAVA_LONG.withName("expansion_add"),
            ValueLayout.JAVA_LONG.withName("expansion_search"),
            ValueLayout.JAVA_BOOLEAN.withName("multi"),
            MemoryLayout.paddingLayout(7));

    private static final Linker LINKER = Linker.nativeLinker();
    private static final SymbolLookup LIB;
    static {
        System.loadLibrary("usearch_tpu");
        LIB = SymbolLookup.loaderLookup();
    }

    private static MethodHandle handle(String name, FunctionDescriptor desc) {
        return LINKER.downcallHandle(LIB.find(name).orElseThrow(
                () -> new UnsatisfiedLinkError("missing symbol " + name)), desc);
    }

    private static final ValueLayout.OfLong SIZE_T = ValueLayout.JAVA_LONG;
    private static final MethodHandle H_INIT = handle("usearch_init",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_FREE = handle("usearch_free",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_SIZE = handle("usearch_size",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_CAPACITY = handle("usearch_capacity",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_DIMENSIONS = handle("usearch_dimensions",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_CONNECTIVITY = handle("usearch_connectivity",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_RESERVE = handle("usearch_reserve",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, SIZE_T, ValueLayout.ADDRESS));
    private static final MethodHandle H_ADD = handle("usearch_add",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
                    ValueLayout.ADDRESS, ValueLayout.JAVA_INT, ValueLayout.ADDRESS));
    private static final MethodHandle H_SEARCH = handle("usearch_search",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT, SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS,
                    ValueLayout.ADDRESS));
    private static final MethodHandle H_FILTERED = handle("usearch_filtered_search",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT, SIZE_T, ValueLayout.ADDRESS, SIZE_T,
                    ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_GET = handle("usearch_get",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
                    SIZE_T, ValueLayout.ADDRESS, ValueLayout.JAVA_INT, ValueLayout.ADDRESS));
    private static final MethodHandle H_CONTAINS = handle("usearch_contains",
            FunctionDescriptor.of(ValueLayout.JAVA_BOOLEAN, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_LONG, ValueLayout.ADDRESS));
    private static final MethodHandle H_COUNT = handle("usearch_count",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
                    ValueLayout.ADDRESS));
    private static final MethodHandle H_REMOVE = handle("usearch_remove",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
                    ValueLayout.ADDRESS));
    private static final MethodHandle H_RENAME = handle("usearch_rename",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.JAVA_LONG,
                    ValueLayout.JAVA_LONG, ValueLayout.ADDRESS));
    private static final MethodHandle H_CLEAR = handle("usearch_clear",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_SAVE = handle("usearch_save",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_LOAD = handle("usearch_load",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_VIEW = handle("usearch_view",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_SERIALIZED_LENGTH = handle("usearch_serialized_length",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_MEMORY_USAGE = handle("usearch_memory_usage",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_HARDWARE = handle("usearch_hardware_acceleration",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_EXPANSION_ADD = handle("usearch_expansion_add",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_EXPANSION_SEARCH = handle("usearch_expansion_search",
            FunctionDescriptor.of(SIZE_T, ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle H_CHANGE_EXPANSION_ADD = handle("usearch_change_expansion_add",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, SIZE_T, ValueLayout.ADDRESS));
    private static final MethodHandle H_CHANGE_EXPANSION_SEARCH = handle("usearch_change_expansion_search",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS, SIZE_T, ValueLayout.ADDRESS));

    private MemorySegment ptr;
    // not final: load/view replace the constructor's configuration with
    // the file's (the stored width may differ)
    private long dimensions;

    private Index(MemorySegment ptr, long dimensions) {
        this.ptr = ptr;
        this.dimensions = dimensions;
    }

    /** Builder mirroring the reference's Index.Config (java/.../Index.java). */
    public static final class Config {
        private int metric = METRIC_COS;
        private int quantization = SCALAR_F32;
        private long dimensions;
        private long connectivity, expansionAdd, expansionSearch;
        private boolean multi;

        public Config metric(int m) { this.metric = m; return this; }
        public Config quantization(int q) { this.quantization = q; return this; }
        public Config dimensions(long d) { this.dimensions = d; return this; }
        public Config connectivity(long c) { this.connectivity = c; return this; }
        public Config expansionAdd(long e) { this.expansionAdd = e; return this; }
        public Config expansionSearch(long e) { this.expansionSearch = e; return this; }
        public Config multi(boolean m) { this.multi = m; return this; }

        public Index build() {
            try (Arena local = Arena.ofConfined()) {
                MemorySegment opts = local.allocate(OPTIONS);
                opts.set(ValueLayout.JAVA_INT, 0, metric);
                opts.set(ValueLayout.ADDRESS, 8, MemorySegment.NULL);
                opts.set(ValueLayout.JAVA_INT, 16, quantization);
                opts.set(ValueLayout.JAVA_LONG, 24, dimensions);
                opts.set(ValueLayout.JAVA_LONG, 32, connectivity);
                opts.set(ValueLayout.JAVA_LONG, 40, expansionAdd);
                opts.set(ValueLayout.JAVA_LONG, 48, expansionSearch);
                opts.set(ValueLayout.JAVA_BOOLEAN, 56, multi);
                MemorySegment err = local.allocate(ValueLayout.ADDRESS);
                err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
                try {
                    MemorySegment p = (MemorySegment) H_INIT.invoke(opts, err);
                    check(err);
                    return new Index(p, dimensions);
                } catch (Throwable t) {
                    throw rethrow(t);
                }
            }
        }
    }

    private static RuntimeException rethrow(Throwable t) {
        return t instanceof RuntimeException r ? r : new RuntimeException(t);
    }

    private static void check(MemorySegment err) {
        MemorySegment msg = err.get(ValueLayout.ADDRESS, 0);
        if (!MemorySegment.NULL.equals(msg))
            throw new IllegalStateException(
                    msg.reinterpret(4096).getString(0));
    }

    private long callSizeT(MethodHandle h) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try {
                long n = (long) h.invoke(ptr, err);
                check(err);
                return n;
            } catch (Throwable t) {
                throw rethrow(t);
            }
        }
    }

    public long size() { return callSizeT(H_SIZE); }
    public long capacity() { return callSizeT(H_CAPACITY); }
    public long dimensions() { return callSizeT(H_DIMENSIONS); }
    public long connectivity() { return callSizeT(H_CONNECTIVITY); }
    public long serializedLength() { return callSizeT(H_SERIALIZED_LENGTH); }
    public long memoryUsage() { return callSizeT(H_MEMORY_USAGE); }
    public long expansionAdd() { return callSizeT(H_EXPANSION_ADD); }
    public long expansionSearch() { return callSizeT(H_EXPANSION_SEARCH); }

    public String hardwareAcceleration() {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try {
                MemorySegment s = (MemorySegment) H_HARDWARE.invoke(ptr, err);
                check(err);
                return s.reinterpret(256).getString(0);
            } catch (Throwable t) {
                throw rethrow(t);
            }
        }
    }

    public void reserve(long capacity) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { H_RESERVE.invoke(ptr, capacity, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public void changeExpansionAdd(long v) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { H_CHANGE_EXPANSION_ADD.invoke(ptr, v, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public void changeExpansionSearch(long v) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { H_CHANGE_EXPANSION_SEARCH.invoke(ptr, v, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public void add(long key, float[] vector) {
        if (vector.length != dimensions)
            throw new IllegalArgumentException(
                    "vector has " + vector.length + " dimensions, index expects " + dimensions);
        try (Arena local = Arena.ofConfined()) {
            MemorySegment vec = local.allocateFrom(ValueLayout.JAVA_FLOAT, vector);
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { H_ADD.invoke(ptr, key, vec, SCALAR_F32, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    /** Result pair for search calls. */
    public record Matches(long[] keys, float[] distances) {}

    public Matches search(float[] query, int count) {
        return searchImpl(query, count, null);
    }

    /** Filtered search: results restricted to {@code allowedKeys}. */
    public Matches filteredSearch(float[] query, int count, long[] allowedKeys) {
        return searchImpl(query, count, allowedKeys);
    }

    private Matches searchImpl(float[] query, int count, long[] allowedKeys) {
        if (query.length != dimensions)
            throw new IllegalArgumentException(
                    "query has " + query.length + " dimensions, index expects " + dimensions);
        try (Arena local = Arena.ofConfined()) {
            MemorySegment q = local.allocateFrom(ValueLayout.JAVA_FLOAT, query);
            MemorySegment outKeys = local.allocate(ValueLayout.JAVA_LONG, count);
            MemorySegment outDists = local.allocate(ValueLayout.JAVA_FLOAT, count);
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try {
                long n;
                if (allowedKeys == null) {
                    n = (long) H_SEARCH.invoke(ptr, q, SCALAR_F32, (long) count,
                            outKeys, outDists, err);
                } else {
                    MemorySegment allow = local.allocateFrom(ValueLayout.JAVA_LONG, allowedKeys);
                    n = (long) H_FILTERED.invoke(ptr, q, SCALAR_F32, (long) count,
                            allow, (long) allowedKeys.length, outKeys, outDists, err);
                }
                check(err);
                long[] keys = new long[(int) n];
                float[] dists = new float[(int) n];
                MemorySegment.copy(outKeys, ValueLayout.JAVA_LONG, 0, keys, 0, (int) n);
                MemorySegment.copy(outDists, ValueLayout.JAVA_FLOAT, 0, dists, 0, (int) n);
                return new Matches(keys, dists);
            } catch (Throwable t) {
                throw rethrow(t);
            }
        }
    }

    public float[] get(long key) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment out = local.allocate(ValueLayout.JAVA_FLOAT, dimensions);
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try {
                long n = (long) H_GET.invoke(ptr, key, 1L, out, SCALAR_F32, err);
                check(err);
                if (n == 0) return null;
                float[] vec = new float[(int) dimensions];
                MemorySegment.copy(out, ValueLayout.JAVA_FLOAT, 0, vec, 0, (int) dimensions);
                return vec;
            } catch (Throwable t) {
                throw rethrow(t);
            }
        }
    }

    public boolean contains(long key) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try {
                boolean found = (boolean) H_CONTAINS.invoke(ptr, key, err);
                check(err);
                return found;
            } catch (Throwable t) { throw rethrow(t); }
        }
    }

    public long count(long key) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { long n = (long) H_COUNT.invoke(ptr, key, err); check(err); return n; }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public long remove(long key) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { long n = (long) H_REMOVE.invoke(ptr, key, err); check(err); return n; }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public long rename(long from, long to) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { long n = (long) H_RENAME.invoke(ptr, from, to, err); check(err); return n; }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public void clear() {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { H_CLEAR.invoke(ptr, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    private void pathCall(MethodHandle h, String path) {
        try (Arena local = Arena.ofConfined()) {
            MemorySegment p = local.allocateFrom(path);
            MemorySegment err = local.allocate(ValueLayout.ADDRESS);
            err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
            try { h.invoke(ptr, p, err); check(err); }
            catch (Throwable t) { throw rethrow(t); }
        }
    }

    public void save(String path) { pathCall(H_SAVE, path); }

    public void load(String path) {
        pathCall(H_LOAD, path);
        dimensions = callSizeT(H_DIMENSIONS);  // file config replaces ctor's
    }

    public void view(String path) {
        pathCall(H_VIEW, path);
        dimensions = callSizeT(H_DIMENSIONS);
    }

    @Override
    public void close() {
        if (ptr != null) {
            try (Arena local = Arena.ofConfined()) {
                MemorySegment err = local.allocate(ValueLayout.ADDRESS);
                err.set(ValueLayout.ADDRESS, 0, MemorySegment.NULL);
                try { H_FREE.invoke(ptr, err); } catch (Throwable ignored) { }
            }
            ptr = null;
        }
    }
}
