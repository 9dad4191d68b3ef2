// Managed wrapper over the usearch_tpu C ABI, mirroring the reference's
// C# surface (reference: csharp/src/Cloud.Unum.USearch/USearchIndex.cs).
using System;

namespace UsearchTpu
{
    public class UsearchIndex : IDisposable
    {
        private IntPtr _handle;
        // not readonly: Load/View replace the constructor's configuration
        // with the file's (the stored width may differ)
        private nuint _dimensions;

        public UsearchIndex(
            MetricKind metric,
            ScalarKind quantization,
            ulong dimensions,
            ulong connectivity = 0,
            ulong expansionAdd = 0,
            ulong expansionSearch = 0,
            bool multi = false)
        {
            var options = new IndexOptions
            {
                MetricKind = metric,
                CustomMetric = IntPtr.Zero,
                Quantization = quantization,
                Dimensions = (nuint)dimensions,
                Connectivity = (nuint)connectivity,
                ExpansionAdd = (nuint)expansionAdd,
                ExpansionSearch = (nuint)expansionSearch,
                Multi = multi,
            };
            _handle = NativeMethods.usearch_init(ref options, out var error);
            NativeMethods.Check(error);
            _dimensions = (nuint)dimensions;
        }

        public UsearchIndex(string path, bool view = false)
        {
            var options = new IndexOptions();
            NativeMethods.usearch_metadata(path, ref options, out var error);
            NativeMethods.Check(error);
            _handle = NativeMethods.usearch_init(ref options, out error);
            NativeMethods.Check(error);
            if (view)
                NativeMethods.usearch_view(_handle, path, out error);
            else
                NativeMethods.usearch_load(_handle, path, out error);
            NativeMethods.Check(error);
            _dimensions = options.Dimensions;
        }

        public static string Version()
        {
            return System.Runtime.InteropServices.Marshal.PtrToStringAnsi(
                NativeMethods.usearch_version()) ?? "";
        }

        public ulong Size()
        {
            var n = NativeMethods.usearch_size(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong Capacity()
        {
            var n = NativeMethods.usearch_capacity(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong Dimensions()
        {
            var n = NativeMethods.usearch_dimensions(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong Connectivity()
        {
            var n = NativeMethods.usearch_connectivity(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong SerializedLength()
        {
            var n = NativeMethods.usearch_serialized_length(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong MemoryUsage()
        {
            var n = NativeMethods.usearch_memory_usage(_handle, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public string HardwareAcceleration()
        {
            var p = NativeMethods.usearch_hardware_acceleration(_handle, out var error);
            NativeMethods.Check(error);
            return System.Runtime.InteropServices.Marshal.PtrToStringAnsi(p) ?? "";
        }

        public void Reserve(ulong capacity)
        {
            NativeMethods.usearch_reserve(_handle, (nuint)capacity, out var error);
            NativeMethods.Check(error);
        }

        public void Add(ulong key, float[] vector)
        {
            CheckDims(vector.Length);
            NativeMethods.usearch_add(_handle, key, vector, ScalarKind.Float32, out var error);
            NativeMethods.Check(error);
        }

        public void Add(ulong key, double[] vector)
        {
            CheckDims(vector.Length);
            NativeMethods.usearch_add_f64(_handle, key, vector, ScalarKind.Float64, out var error);
            NativeMethods.Check(error);
        }

        public void Add(ulong key, sbyte[] vector)
        {
            CheckDims(vector.Length);
            NativeMethods.usearch_add_i8(_handle, key, vector, ScalarKind.Int8, out var error);
            NativeMethods.Check(error);
        }

        public void Add(ulong[] keys, float[][] vectors)
        {
            for (int i = 0; i < keys.Length; i++)
                Add(keys[i], vectors[i]);
        }

        public bool Contains(ulong key)
        {
            var found = NativeMethods.usearch_contains(_handle, key, out var error);
            NativeMethods.Check(error);
            return found;
        }

        public ulong Count(ulong key)
        {
            var n = NativeMethods.usearch_count(_handle, key, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong Search(float[] query, ulong count, out ulong[] keys, out float[] distances)
        {
            CheckDims(query.Length);
            keys = new ulong[count];
            distances = new float[count];
            var n = NativeMethods.usearch_search(
                _handle, query, ScalarKind.Float32, (nuint)count, keys, distances, out var error);
            NativeMethods.Check(error);
            Array.Resize(ref keys, (int)n);
            Array.Resize(ref distances, (int)n);
            return n;
        }

        public ulong Search(sbyte[] query, ulong count, out ulong[] keys, out float[] distances)
        {
            CheckDims(query.Length);
            keys = new ulong[count];
            distances = new float[count];
            var n = NativeMethods.usearch_search_i8(
                _handle, query, ScalarKind.Int8, (nuint)count, keys, distances, out var error);
            NativeMethods.Check(error);
            Array.Resize(ref keys, (int)n);
            Array.Resize(ref distances, (int)n);
            return n;
        }

        public ulong FilteredSearch(float[] query, ulong count, ulong[] allowedKeys,
            out ulong[] keys, out float[] distances)
        {
            CheckDims(query.Length);
            keys = new ulong[count];
            distances = new float[count];
            var n = NativeMethods.usearch_filtered_search(
                _handle, query, ScalarKind.Float32, (nuint)count,
                allowedKeys, (nuint)(allowedKeys?.Length ?? 0), keys, distances, out var error);
            NativeMethods.Check(error);
            Array.Resize(ref keys, (int)n);
            Array.Resize(ref distances, (int)n);
            return n;
        }

        public bool Get(ulong key, out float[] vector)
        {
            vector = new float[_dimensions];
            var n = NativeMethods.usearch_get(_handle, key, 1, vector, ScalarKind.Float32, out var error);
            NativeMethods.Check(error);
            if (n == 0) { vector = Array.Empty<float>(); return false; }
            return true;
        }

        public ulong Get(ulong key, ulong count, out float[][] vectors)
        {
            var flat = new float[(ulong)_dimensions * count];
            var n = NativeMethods.usearch_get(_handle, key, (nuint)count, flat, ScalarKind.Float32, out var error);
            NativeMethods.Check(error);
            vectors = new float[n][];
            for (ulong i = 0; i < n; i++)
            {
                vectors[i] = new float[_dimensions];
                Array.Copy(flat, (long)(i * _dimensions), vectors[i], 0, (long)_dimensions);
            }
            return n;
        }

        public ulong Remove(ulong key)
        {
            var n = NativeMethods.usearch_remove(_handle, key, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public ulong Rename(ulong from, ulong to)
        {
            var n = NativeMethods.usearch_rename(_handle, from, to, out var error);
            NativeMethods.Check(error);
            return n;
        }

        public void Clear()
        {
            NativeMethods.usearch_clear(_handle, out var error);
            NativeMethods.Check(error);
        }

        public void Save(string path)
        {
            NativeMethods.usearch_save(_handle, path, out var error);
            NativeMethods.Check(error);
        }

        public void Load(string path)
        {
            NativeMethods.usearch_load(_handle, path, out var error);
            NativeMethods.Check(error);
            RefreshConfig();
        }

        public void View(string path)
        {
            NativeMethods.usearch_view(_handle, path, out var error);
            NativeMethods.Check(error);
            RefreshConfig();
        }

        /// Re-read engine-side geometry after load/view: the file's
        /// configuration replaces the constructor's.
        private void RefreshConfig()
        {
            _dimensions = NativeMethods.usearch_dimensions(_handle, out var error);
            NativeMethods.Check(error);
        }

        public byte[] SaveBuffer()
        {
            var buffer = new byte[SerializedLength()];
            NativeMethods.usearch_save_buffer(_handle, buffer, (nuint)buffer.Length, out var error);
            NativeMethods.Check(error);
            return buffer;
        }

        public void LoadBuffer(byte[] buffer)
        {
            NativeMethods.usearch_load_buffer(_handle, buffer, (nuint)buffer.Length, out var error);
            NativeMethods.Check(error);
            RefreshConfig();
        }

        public static float Distance(float[] a, float[] b, MetricKind metric)
        {
            if (a.Length != b.Length)
                throw new ArgumentException($"dimension mismatch: {a.Length} vs {b.Length}");
            var d = NativeMethods.usearch_distance(
                a, b, ScalarKind.Float32, (nuint)a.Length, metric, out var error);
            NativeMethods.Check(error);
            return d;
        }

        private void CheckDims(int n)
        {
            if ((nuint)n != _dimensions)
                throw new ArgumentException($"vector has {n} dimensions, index expects {_dimensions}");
        }

        public void Dispose()
        {
            Dispose(true);
            GC.SuppressFinalize(this);
        }

        protected virtual void Dispose(bool disposing)
        {
            if (_handle != IntPtr.Zero)
            {
                NativeMethods.usearch_free(_handle, out _);
                _handle = IntPtr.Zero;
            }
        }

        ~UsearchIndex() => Dispose(false);
    }
}
