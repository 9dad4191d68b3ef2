// Swift binding for the usearch_tpu engine over its C ABI (c/usearch_tpu.h),
// the same layering the reference uses (reference: swift/USearch.swift over
// the ObjC++ wrapper; this binding skips the ObjC layer and imports the C
// ABI directly through the CUSearchTpu system-library module below).
//
// Build: `make -C ../c libusearch_tpu.so`, then
//   swift build -Xcc -I../c -Xlinker -L../c -Xlinker -lusearch_tpu
//
// NOTE: no Swift toolchain ships in the development image this file was
// authored in; the binding is source-complete and mirrors the tested C
// smoke test (c/test.c) call-for-call, but has not itself been compiled.

import CUSearchTpu
import Foundation

public enum USearchMetric: UInt32 {
    case cos = 1, ip, l2sq, haversine, divergence, pearson, jaccard, hamming,
         tanimoto, sorensen
}

public enum USearchScalar: UInt32 {
    case f32 = 1, f64, f16, bf16, i8, b1
}

public struct USearchError: Error, CustomStringConvertible {
    public let message: String
    public var description: String { "usearch_tpu: \(message)" }
}

@inline(__always)
private func check(_ error: usearch_error_t?) throws {
    if let error = error {
        throw USearchError(message: String(cString: error))
    }
}

/// One dense usearch_tpu index.
public final class USearchIndex {
    private var handle: usearch_index_t?
    /// load/view replace the constructor's configuration with the file's
    /// (the stored width may differ), so this refreshes after both.
    public private(set) var dimensions: Int

    public init(
        metric: USearchMetric = .cos,
        quantization: USearchScalar = .f32,
        dimensions: Int,
        connectivity: Int = 0,
        expansionAdd: Int = 0,
        expansionSearch: Int = 0,
        multi: Bool = false
    ) throws {
        var options = usearch_init_options_t()
        options.metric_kind = usearch_metric_kind_t(metric.rawValue)
        options.metric = nil
        options.quantization = usearch_scalar_kind_t(quantization.rawValue)
        options.dimensions = dimensions
        options.connectivity = connectivity
        options.expansion_add = expansionAdd
        options.expansion_search = expansionSearch
        options.multi = multi
        var error: usearch_error_t?
        handle = usearch_init(&options, &error)
        try check(error)
        self.dimensions = dimensions
    }

    deinit {
        if let handle = handle {
            var error: usearch_error_t?
            usearch_free(handle, &error)
        }
    }

    public static var version: String { String(cString: usearch_version()) }

    public var count: Int {
        var error: usearch_error_t?
        return usearch_size(handle, &error)
    }

    public var capacity: Int {
        var error: usearch_error_t?
        return usearch_capacity(handle, &error)
    }

    public var connectivity: Int {
        var error: usearch_error_t?
        return usearch_connectivity(handle, &error)
    }

    public var serializedLength: Int {
        var error: usearch_error_t?
        return usearch_serialized_length(handle, &error)
    }

    public var memoryUsage: Int {
        var error: usearch_error_t?
        return usearch_memory_usage(handle, &error)
    }

    public var hardwareAcceleration: String {
        var error: usearch_error_t?
        guard let name = usearch_hardware_acceleration(handle, &error) else { return "" }
        return String(cString: name)
    }

    public func reserve(_ capacity: Int) throws {
        var error: usearch_error_t?
        usearch_reserve(handle, capacity, &error)
        try check(error)
    }

    private func checkDims(_ n: Int) throws {
        guard n == dimensions else {
            throw USearchError(message: "vector has \(n) dimensions, index expects \(dimensions)")
        }
    }

    public func add(key: UInt64, vector: [Float32]) throws {
        try checkDims(vector.count)
        var error: usearch_error_t?
        vector.withUnsafeBufferPointer { buf in
            usearch_add(handle, key, buf.baseAddress, usearch_scalar_f32_k, &error)
        }
        try check(error)
    }

    public func add(key: UInt64, vector: [Int8]) throws {
        try checkDims(vector.count)
        var error: usearch_error_t?
        vector.withUnsafeBufferPointer { buf in
            usearch_add(handle, key, buf.baseAddress, usearch_scalar_i8_k, &error)
        }
        try check(error)
    }

    public func search(vector: [Float32], count: Int) throws -> ([UInt64], [Float32]) {
        try checkDims(vector.count)
        var keys = [UInt64](repeating: 0, count: count)
        var distances = [Float32](repeating: 0, count: count)
        var error: usearch_error_t?
        let found = vector.withUnsafeBufferPointer { q in
            keys.withUnsafeMutableBufferPointer { k in
                distances.withUnsafeMutableBufferPointer { d in
                    usearch_search(handle, q.baseAddress, usearch_scalar_f32_k,
                                   count, k.baseAddress, d.baseAddress, &error)
                }
            }
        }
        try check(error)
        return (Array(keys.prefix(found)), Array(distances.prefix(found)))
    }

    public func filteredSearch(
        vector: [Float32], count: Int, allowedKeys: [UInt64]
    ) throws -> ([UInt64], [Float32]) {
        try checkDims(vector.count)
        var keys = [UInt64](repeating: 0, count: count)
        var distances = [Float32](repeating: 0, count: count)
        var error: usearch_error_t?
        let found = vector.withUnsafeBufferPointer { q in
            allowedKeys.withUnsafeBufferPointer { allow in
                keys.withUnsafeMutableBufferPointer { k in
                    distances.withUnsafeMutableBufferPointer { d in
                        usearch_filtered_search(
                            handle, q.baseAddress, usearch_scalar_f32_k, count,
                            allow.baseAddress, allowedKeys.count,
                            k.baseAddress, d.baseAddress, &error)
                    }
                }
            }
        }
        try check(error)
        return (Array(keys.prefix(found)), Array(distances.prefix(found)))
    }

    public func get(key: UInt64) throws -> [Float32]? {
        var out = [Float32](repeating: 0, count: dimensions)
        var error: usearch_error_t?
        let n = out.withUnsafeMutableBufferPointer { buf in
            usearch_get(handle, key, 1, buf.baseAddress, usearch_scalar_f32_k, &error)
        }
        try check(error)
        return n == 0 ? nil : out
    }

    public func contains(key: UInt64) throws -> Bool {
        var error: usearch_error_t?
        let found = usearch_contains(handle, key, &error)
        try check(error)
        return found
    }

    @discardableResult
    public func remove(key: UInt64) throws -> Int {
        var error: usearch_error_t?
        let n = usearch_remove(handle, key, &error)
        try check(error)
        return n
    }

    @discardableResult
    public func rename(from: UInt64, to: UInt64) throws -> Int {
        var error: usearch_error_t?
        let n = usearch_rename(handle, from, to, &error)
        try check(error)
        return n
    }

    public func clear() throws {
        var error: usearch_error_t?
        usearch_clear(handle, &error)
        try check(error)
    }

    public func save(path: String) throws {
        var error: usearch_error_t?
        usearch_save(handle, path, &error)
        try check(error)
    }

    public func load(path: String) throws {
        var error: usearch_error_t?
        usearch_load(handle, path, &error)
        try check(error)
        try refreshConfig()
    }

    public func view(path: String) throws {
        var error: usearch_error_t?
        usearch_view(handle, path, &error)
        try check(error)
        try refreshConfig()
    }

    private func refreshConfig() throws {
        var error: usearch_error_t?
        let d = usearch_dimensions(handle, &error)
        try check(error)
        dimensions = d
    }
}
