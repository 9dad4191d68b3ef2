// P/Invoke surface over the usearch_tpu C ABI (c/usearch_tpu.h), mirroring
// the layering of the reference C# binding (reference:
// csharp/src/Cloud.Unum.USearch/NativeMethods.cs over c/usearch.h).
//
// Build: `make -C ../../../c libusearch_tpu.so`, place the library on the
// loader path (LD_LIBRARY_PATH / DllImport search path). No .NET toolchain
// ships in the development image this file was authored in; the binding is
// source-complete and mirrors the tested C smoke test (c/test.c).
using System;
using System.Runtime.InteropServices;

namespace UsearchTpu
{
    public enum MetricKind : uint
    {
        Unknown = 0,
        Cos,
        InnerProduct,
        L2sq,
        Haversine,
        Divergence,
        Pearson,
        Jaccard,
        Hamming,
        Tanimoto,
        Sorensen,
    }

    public enum ScalarKind : uint
    {
        Unknown = 0,
        Float32,
        Float64,
        Float16,
        BFloat16,
        Int8,
        Bit1,
    }

    [StructLayout(LayoutKind.Sequential)]
    public struct IndexOptions
    {
        public MetricKind MetricKind;
        public IntPtr CustomMetric; // usearch_metric_t; IntPtr.Zero for built-ins
        public ScalarKind Quantization;
        public nuint Dimensions;
        public nuint Connectivity;
        public nuint ExpansionAdd;
        public nuint ExpansionSearch;
        [MarshalAs(UnmanagedType.I1)] public bool Multi;
    }

    internal static class NativeMethods
    {
        private const string Lib = "usearch_tpu";

        [DllImport(Lib)] internal static extern IntPtr usearch_version();

        [DllImport(Lib)] internal static extern IntPtr usearch_init(ref IndexOptions options, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_free(IntPtr index, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_memory_usage(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern IntPtr usearch_hardware_acceleration(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_serialized_length(IntPtr index, out IntPtr error);

        [DllImport(Lib)] internal static extern void usearch_save(IntPtr index, string path, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_load(IntPtr index, string path, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_view(IntPtr index, string path, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_metadata(string path, ref IndexOptions options, out IntPtr error);

        [DllImport(Lib)] internal static extern void usearch_save_buffer(IntPtr index, byte[] buffer, nuint length, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_load_buffer(IntPtr index, byte[] buffer, nuint length, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_view_buffer(IntPtr index, byte[] buffer, nuint length, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_metadata_buffer(byte[] buffer, nuint length, ref IndexOptions options, out IntPtr error);

        [DllImport(Lib)] internal static extern void usearch_change_threads_add(IntPtr index, nuint threads, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_change_threads_search(IntPtr index, nuint threads, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_change_metric_kind(IntPtr index, MetricKind kind, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_size(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_capacity(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_dimensions(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_connectivity(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_reserve(IntPtr index, nuint capacity, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_expansion_add(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_expansion_search(IntPtr index, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_change_expansion_add(IntPtr index, nuint expansion, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_change_expansion_search(IntPtr index, nuint expansion, out IntPtr error);

        [DllImport(Lib)] internal static extern void usearch_add(IntPtr index, ulong key, float[] vector, ScalarKind kind, out IntPtr error);
        [DllImport(Lib, EntryPoint = "usearch_add")] internal static extern void usearch_add_f64(IntPtr index, ulong key, double[] vector, ScalarKind kind, out IntPtr error);
        [DllImport(Lib, EntryPoint = "usearch_add")] internal static extern void usearch_add_i8(IntPtr index, ulong key, sbyte[] vector, ScalarKind kind, out IntPtr error);

        [DllImport(Lib)] [return: MarshalAs(UnmanagedType.I1)]
        internal static extern bool usearch_contains(IntPtr index, ulong key, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_count(IntPtr index, ulong key, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_search(
            IntPtr index, float[] query, ScalarKind kind, nuint count,
            ulong[] foundKeys, float[] foundDistances, out IntPtr error);
        [DllImport(Lib, EntryPoint = "usearch_search")] internal static extern nuint usearch_search_i8(
            IntPtr index, sbyte[] query, ScalarKind kind, nuint count,
            ulong[] foundKeys, float[] foundDistances, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_filtered_search(
            IntPtr index, float[] query, ScalarKind kind, nuint count,
            ulong[] allowedKeys, nuint allowedCount,
            ulong[] foundKeys, float[] foundDistances, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_get(
            IntPtr index, ulong key, nuint count, float[] vectors, ScalarKind kind, out IntPtr error);

        [DllImport(Lib)] internal static extern nuint usearch_remove(IntPtr index, ulong key, out IntPtr error);
        [DllImport(Lib)] internal static extern nuint usearch_rename(IntPtr index, ulong from, ulong to, out IntPtr error);
        [DllImport(Lib)] internal static extern void usearch_clear(IntPtr index, out IntPtr error);

        [DllImport(Lib)] internal static extern float usearch_distance(
            float[] a, float[] b, ScalarKind kind, nuint dimensions, MetricKind metric, out IntPtr error);

        [DllImport(Lib)] internal static extern void usearch_exact_search(
            float[] dataset, nuint datasetCount, nuint datasetStride,
            float[] queries, nuint queriesCount, nuint queriesStride,
            ScalarKind kind, nuint dimensions, MetricKind metric, nuint count, nuint threads,
            ulong[] keys, nuint keysStride, float[] distances, nuint distancesStride,
            out IntPtr error);

        internal static void Check(IntPtr error)
        {
            if (error != IntPtr.Zero)
                throw new UsearchException(Marshal.PtrToStringAnsi(error) ?? "unknown usearch_tpu error");
        }
    }

    public class UsearchException : Exception
    {
        public UsearchException(string message) : base(message) { }
    }
}
