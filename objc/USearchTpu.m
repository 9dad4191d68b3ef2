/**
 * USTIndex implementation — a thin delegation layer over the usearch_tpu
 * C ABI, mirroring the role of the reference's USearchObjective.mm
 * (reference: objc/USearchObjective.mm:380; every method body there likewise
 * forwards to c/usearch.h entry points).
 *
 * Build (requires an Objective-C toolchain + built libusearch_tpu.so):
 *   clang -fobjc-arc -I../c USearchTpu.m -L../c -lusearch_tpu \
 *         -framework Foundation -shared -o libusearchtpu_objc.dylib
 */
#import "USearchTpu.h"

#include "usearch_tpu.h"

NSString *const USearchTpuException = @"USearchTpuException";

static void USTCheck(usearch_error_t error) {
    if (error != NULL) {
        [NSException raise:USearchTpuException
                    format:@"%s", error];
    }
}

@implementation USTIndex {
    usearch_index_t _handle;
}

+ (instancetype)make:(USTMetric)metric
          dimensions:(UInt32)dimensions
        connectivity:(UInt32)connectivity
        quantization:(USTScalar)quantization {
    return [USTIndex make:metric
               dimensions:dimensions
             connectivity:connectivity
             quantization:quantization
             expansionAdd:128
          expansionSearch:64
                    multi:false];
}

+ (instancetype)make:(USTMetric)metric
          dimensions:(UInt32)dimensions
        connectivity:(UInt32)connectivity
        quantization:(USTScalar)quantization
        expansionAdd:(UInt32)expansionAdd
     expansionSearch:(UInt32)expansionSearch
               multi:(Boolean)multi {
    usearch_init_options_t opts;
    opts.metric_kind = (usearch_metric_kind_t)metric;
    opts.metric = NULL;
    opts.quantization = (usearch_scalar_kind_t)quantization;
    opts.dimensions = dimensions;
    opts.connectivity = connectivity;
    opts.expansion_add = expansionAdd;
    opts.expansion_search = expansionSearch;
    opts.multi = multi;
    usearch_error_t error = NULL;
    usearch_index_t handle = usearch_init(&opts, &error);
    USTCheck(error);
    USTIndex *instance = [[USTIndex alloc] initPrivate];
    instance->_handle = handle;
    return instance;
}

- (instancetype)initPrivate {
    self = [super init];
    return self;
}

- (void)dealloc {
    if (_handle != NULL) {
        usearch_error_t error = NULL;
        usearch_free(_handle, &error);
        _handle = NULL;
    }
}

#define UST_GETTER(NAME, FN)                                \
    -(UInt32)NAME {                                         \
        usearch_error_t error = NULL;                       \
        UInt32 out = (UInt32)FN(_handle, &error);           \
        USTCheck(error);                                    \
        return out;                                         \
    }

UST_GETTER(dimensions, usearch_dimensions)
UST_GETTER(connectivity, usearch_connectivity)
UST_GETTER(expansionAdd, usearch_expansion_add)
UST_GETTER(expansionSearch, usearch_expansion_search)
UST_GETTER(length, usearch_size)
UST_GETTER(capacity, usearch_capacity)

- (Boolean)isEmpty {
    return self.length == 0;
}

- (NSString *)hardwareAcceleration {
    usearch_error_t error = NULL;
    char const *name = usearch_hardware_acceleration(_handle, &error);
    USTCheck(error);
    return [NSString stringWithUTF8String:(name ? name : "unknown")];
}

- (void)reserve:(UInt32)count {
    usearch_error_t error = NULL;
    usearch_reserve(_handle, count, &error);
    USTCheck(error);
}

static void USTAdd(usearch_index_t handle, USTKey key, void const *vector,
                   usearch_scalar_kind_t kind) {
    usearch_error_t error = NULL;
    usearch_add(handle, key, vector, kind, &error);
    USTCheck(error);
}

static UInt32 USTSearch(usearch_index_t handle, void const *vector,
                        usearch_scalar_kind_t kind, UInt32 count,
                        USTKey *keys, Float32 *distances) {
    usearch_error_t error = NULL;
    size_t found = usearch_search(handle, vector, kind, count, keys, distances, &error);
    USTCheck(error);
    return (UInt32)found;
}

static UInt32 USTGet(usearch_index_t handle, USTKey key, UInt32 count,
                     void *vector, usearch_scalar_kind_t kind) {
    usearch_error_t error = NULL;
    size_t found = usearch_get(handle, key, count, vector, kind, &error);
    USTCheck(error);
    return (UInt32)found;
}

- (void)addSingle:(USTKey)key vector:(Float32 const *)vector {
    USTAdd(_handle, key, vector, usearch_scalar_f32_k);
}

- (UInt32)searchSingle:(Float32 const *)vector
                 count:(UInt32)count
                  keys:(USTKey *)keys
             distances:(Float32 *)distances {
    return USTSearch(_handle, vector, usearch_scalar_f32_k, count, keys, distances);
}

- (UInt32)filteredSearchSingle:(Float32 const *)vector
                         count:(UInt32)count
                   allowedKeys:(USTKey const *)allowedKeys
                  allowedCount:(UInt32)allowedCount
                          keys:(USTKey *)keys
                     distances:(Float32 *)distances {
    usearch_error_t error = NULL;
    size_t found = usearch_filtered_search(_handle, vector, usearch_scalar_f32_k,
                                           count, allowedKeys, allowedCount,
                                           keys, distances, &error);
    USTCheck(error);
    return (UInt32)found;
}

- (UInt32)getSingle:(USTKey)key vector:(Float32 *)vector count:(UInt32)count {
    return USTGet(_handle, key, count, vector, usearch_scalar_f32_k);
}

- (void)addDouble:(USTKey)key vector:(Float64 const *)vector {
    USTAdd(_handle, key, vector, usearch_scalar_f64_k);
}

- (UInt32)searchDouble:(Float64 const *)vector
                 count:(UInt32)count
                  keys:(USTKey *)keys
             distances:(Float32 *)distances {
    return USTSearch(_handle, vector, usearch_scalar_f64_k, count, keys, distances);
}

- (UInt32)getDouble:(USTKey)key vector:(Float64 *)vector count:(UInt32)count {
    return USTGet(_handle, key, count, vector, usearch_scalar_f64_k);
}

- (void)addI8:(USTKey)key vector:(SInt8 const *)vector {
    USTAdd(_handle, key, vector, usearch_scalar_i8_k);
}

- (UInt32)searchI8:(SInt8 const *)vector
             count:(UInt32)count
              keys:(USTKey *)keys
         distances:(Float32 *)distances {
    return USTSearch(_handle, vector, usearch_scalar_i8_k, count, keys, distances);
}

- (Boolean)contains:(USTKey)key {
    usearch_error_t error = NULL;
    bool out = usearch_contains(_handle, key, &error);
    USTCheck(error);
    return out;
}

- (UInt32)count:(USTKey)key {
    usearch_error_t error = NULL;
    size_t out = usearch_count(_handle, key, &error);
    USTCheck(error);
    return (UInt32)out;
}

- (UInt32)remove:(USTKey)key {
    usearch_error_t error = NULL;
    size_t out = usearch_remove(_handle, key, &error);
    USTCheck(error);
    return (UInt32)out;
}

- (Boolean)rename:(USTKey)from to:(USTKey)to {
    usearch_error_t error = NULL;
    size_t out = usearch_rename(_handle, from, to, &error);
    USTCheck(error);
    return out > 0;
}

- (void)save:(NSString *)path {
    usearch_error_t error = NULL;
    usearch_save(_handle, path.UTF8String, &error);
    USTCheck(error);
}

- (void)load:(NSString *)path {
    usearch_error_t error = NULL;
    usearch_load(_handle, path.UTF8String, &error);
    USTCheck(error);
}

- (void)view:(NSString *)path {
    usearch_error_t error = NULL;
    usearch_view(_handle, path.UTF8String, &error);
    USTCheck(error);
}

- (void)clear {
    usearch_error_t error = NULL;
    usearch_clear(_handle, &error);
    USTCheck(error);
}

@end
