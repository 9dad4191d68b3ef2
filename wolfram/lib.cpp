/**
 * Wolfram Language (LibraryLink) binding over the usearch_tpu C ABI —
 * the same exported surface as the reference's wolfram/lib.cpp:171
 * (IndexCreate/Save/Load/View/Destroy/Size/Connectivity/Dimensions/
 * Capacity/Add/Search), re-implemented over c/usearch_tpu.h.
 *
 * SOURCE-ONLY in this image: WolframLibrary.h ships with Mathematica,
 * which is not installable here. Build on a host with Mathematica:
 *   g++ -O2 -std=c++17 -shared -fPIC -I"$MMA/SystemFiles/IncludeFiles/C" \
 *       -I../c lib.cpp -L../c -lusearch_tpu -o usearch_tpu_wolfram.so
 * Drive with test.wls. The ABI underneath is exercised by
 * tests/test_cabi_conformance.py.
 */
#include "WolframLibrary.h"

#include <cstring>
#include <string>
#include <vector>

#include "usearch_tpu.h"

namespace {

usearch_index_t g_index = nullptr;

int fail(WolframLibraryData libData, usearch_error_t error) {
    if (error && libData && libData->Message)
        libData->Message(error);
    return LIBRARY_FUNCTION_ERROR;
}

}  // namespace

EXTERN_C DLLEXPORT mint WolframLibrary_getVersion() { return WolframLibraryVersion; }
EXTERN_C DLLEXPORT int WolframLibrary_initialize(WolframLibraryData libData) {
    (void)libData;
    return LIBRARY_NO_ERROR;
}
EXTERN_C DLLEXPORT void WolframLibrary_uninitialize(WolframLibraryData libData) {
    (void)libData;
    if (g_index) {
        usearch_error_t error = nullptr;
        usearch_free(g_index, &error);
        g_index = nullptr;
    }
}

// IndexCreate[metricName, scalarName, dimensions, connectivity, expAdd, expSearch]
EXTERN_C DLLEXPORT int IndexCreate(WolframLibraryData libData, mint Argc, MArgument* Args,
                                   MArgument Res) {
    if (Argc != 6)
        return LIBRARY_FUNCTION_ERROR;
    char const* metric_name = MArgument_getUTF8String(Args[0]);
    char const* scalar_name = MArgument_getUTF8String(Args[1]);
    usearch_init_options_t opts;
    std::memset(&opts, 0, sizeof(opts));
    auto metric_of = [](std::string const& s) {
        if (s == "ip") return usearch_metric_ip_k;
        if (s == "l2sq") return usearch_metric_l2sq_k;
        if (s == "hamming") return usearch_metric_hamming_k;
        if (s == "tanimoto") return usearch_metric_tanimoto_k;
        if (s == "sorensen") return usearch_metric_sorensen_k;
        if (s == "haversine") return usearch_metric_haversine_k;
        if (s == "pearson") return usearch_metric_pearson_k;
        return usearch_metric_cos_k;
    };
    auto scalar_of = [](std::string const& s) {
        if (s == "f64") return usearch_scalar_f64_k;
        if (s == "f16") return usearch_scalar_f16_k;
        if (s == "bf16") return usearch_scalar_bf16_k;
        if (s == "i8") return usearch_scalar_i8_k;
        if (s == "b1") return usearch_scalar_b1_k;
        return usearch_scalar_f32_k;
    };
    opts.metric_kind = metric_of(metric_name);
    opts.quantization = scalar_of(scalar_name);
    opts.dimensions = (size_t)MArgument_getInteger(Args[2]);
    opts.connectivity = (size_t)MArgument_getInteger(Args[3]);
    opts.expansion_add = (size_t)MArgument_getInteger(Args[4]);
    opts.expansion_search = (size_t)MArgument_getInteger(Args[5]);
    usearch_error_t error = nullptr;
    usearch_index_t index = usearch_init(&opts, &error);
    if (error)
        return fail(libData, error);
    if (g_index) {
        usearch_error_t e2 = nullptr;
        usearch_free(g_index, &e2);
    }
    g_index = index;
    MArgument_setInteger(Res, (mint)(uintptr_t)index);
    return LIBRARY_NO_ERROR;
}

#define UST_PATH_OP(NAME, FN)                                                          \
    EXTERN_C DLLEXPORT int NAME(WolframLibraryData libData, mint Argc, MArgument* Args, \
                                MArgument Res) {                                       \
        if (Argc != 1) return LIBRARY_FUNCTION_ERROR;                                  \
        usearch_error_t error = nullptr;                                               \
        FN(g_index, MArgument_getUTF8String(Args[0]), &error);                         \
        if (error) return fail(libData, error);                                        \
        MArgument_setInteger(Res, 0);                                                  \
        return LIBRARY_NO_ERROR;                                                       \
    }

UST_PATH_OP(IndexSave, usearch_save)
UST_PATH_OP(IndexLoad, usearch_load)
UST_PATH_OP(IndexView, usearch_view)

EXTERN_C DLLEXPORT int IndexDestroy(WolframLibraryData libData, mint Argc, MArgument* Args,
                                    MArgument Res) {
    (void)Argc;
    (void)Args;
    usearch_error_t error = nullptr;
    usearch_free(g_index, &error);
    g_index = nullptr;
    if (error)
        return fail(libData, error);
    MArgument_setInteger(Res, 0);
    return LIBRARY_NO_ERROR;
}

#define UST_SIZE_OP(NAME, FN)                                                          \
    EXTERN_C DLLEXPORT int NAME(WolframLibraryData libData, mint Argc, MArgument* Args, \
                                MArgument Res) {                                       \
        (void)Argc;                                                                    \
        (void)Args;                                                                    \
        usearch_error_t error = nullptr;                                               \
        size_t out = FN(g_index, &error);                                              \
        if (error) return fail(libData, error);                                        \
        MArgument_setInteger(Res, (mint)out);                                          \
        return LIBRARY_NO_ERROR;                                                       \
    }

UST_SIZE_OP(IndexSize, usearch_size)
UST_SIZE_OP(IndexConnectivity, usearch_connectivity)
UST_SIZE_OP(IndexDimensions, usearch_dimensions)
UST_SIZE_OP(IndexCapacity, usearch_capacity)

// IndexAdd[key, vector(Real64 tensor)]
EXTERN_C DLLEXPORT int IndexAdd(WolframLibraryData libData, mint Argc, MArgument* Args,
                                MArgument Res) {
    if (Argc != 2)
        return LIBRARY_FUNCTION_ERROR;
    usearch_key_t key = (usearch_key_t)MArgument_getInteger(Args[0]);
    MTensor vec = MArgument_getMTensor(Args[1]);
    double* data = libData->MTensor_getRealData(vec);
    usearch_error_t error = nullptr;
    usearch_reserve(g_index, usearch_size(g_index, &error) + 1, &error);
    usearch_add(g_index, key, data, usearch_scalar_f64_k, &error);
    if (error)
        return fail(libData, error);
    MArgument_setInteger(Res, 0);
    return LIBRARY_NO_ERROR;
}

// IndexSearch[vector(Real64 tensor), count] -> Integer64 tensor of keys
EXTERN_C DLLEXPORT int IndexSearch(WolframLibraryData libData, mint Argc, MArgument* Args,
                                   MArgument Res) {
    if (Argc != 2)
        return LIBRARY_FUNCTION_ERROR;
    MTensor vec = MArgument_getMTensor(Args[0]);
    mint wanted = MArgument_getInteger(Args[1]);
    double* data = libData->MTensor_getRealData(vec);
    std::vector<usearch_key_t> keys((size_t)wanted);
    std::vector<usearch_distance_t> distances((size_t)wanted);
    usearch_error_t error = nullptr;
    size_t found = usearch_search(g_index, data, usearch_scalar_f64_k, (size_t)wanted,
                                  keys.data(), distances.data(), &error);
    if (error)
        return fail(libData, error);
    MTensor out;
    mint dims[1] = {(mint)found};
    libData->MTensor_new(MType_Integer, 1, dims, &out);
    mint* out_data = libData->MTensor_getIntegerData(out);
    for (size_t i = 0; i != found; ++i)
        out_data[i] = (mint)keys[i];
    MArgument_setMTensor(Res, out);
    return LIBRARY_NO_ERROR;
}
