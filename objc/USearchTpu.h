/**
 * Objective-C wrapper over the usearch_tpu C ABI (c/usearch_tpu.h) —
 * capability parity with the reference's USearchIndex class
 * (reference: objc/include/USearchObjective.h, objc/USearchObjective.mm:380).
 *
 * SOURCE-ONLY in this image (no Objective-C runtime/toolchain); the ABI the
 * class binds is exercised end-to-end by tests/test_cabi_conformance.py.
 * Errors surface as NSException (USearchTpuException).
 */
#import <Foundation/Foundation.h>

NS_ASSUME_NONNULL_BEGIN

typedef NS_ENUM(NSUInteger, USTScalar) {
    USTScalarF32 = 1,
    USTScalarF64 = 2,
    USTScalarF16 = 3,
    USTScalarBF16 = 4,
    USTScalarI8 = 5,
    USTScalarB1 = 6,
};

typedef NS_ENUM(NSUInteger, USTMetric) {
    USTMetricCos = 1,
    USTMetricIP = 2,
    USTMetricL2sq = 3,
    USTMetricHaversine = 4,
    USTMetricDivergence = 5,
    USTMetricPearson = 6,
    USTMetricJaccard = 7,
    USTMetricHamming = 8,
    USTMetricTanimoto = 9,
    USTMetricSorensen = 10,
};

typedef UInt64 USTKey;

@interface USTIndex : NSObject

@property (readonly) UInt32 dimensions;
@property (readonly) UInt32 connectivity;
@property (readonly) UInt32 expansionAdd;
@property (readonly) UInt32 expansionSearch;
@property (readonly) UInt32 length;
@property (readonly) UInt32 capacity;
@property (readonly) Boolean isEmpty;
@property (readonly) NSString *hardwareAcceleration;

- (instancetype)init NS_UNAVAILABLE;

+ (instancetype)make:(USTMetric)metric
          dimensions:(UInt32)dimensions
        connectivity:(UInt32)connectivity
        quantization:(USTScalar)quantization;

+ (instancetype)make:(USTMetric)metric
          dimensions:(UInt32)dimensions
        connectivity:(UInt32)connectivity
        quantization:(USTScalar)quantization
        expansionAdd:(UInt32)expansionAdd
     expansionSearch:(UInt32)expansionSearch
               multi:(Boolean)multi;

- (void)reserve:(UInt32)count;

- (void)addSingle:(USTKey)key vector:(Float32 const *_Nonnull)vector;
- (UInt32)searchSingle:(Float32 const *_Nonnull)vector
                 count:(UInt32)count
                  keys:(USTKey *_Nullable)keys
             distances:(Float32 *_Nullable)distances;
- (UInt32)filteredSearchSingle:(Float32 const *_Nonnull)vector
                         count:(UInt32)count
                   allowedKeys:(USTKey const *_Nullable)allowedKeys
                  allowedCount:(UInt32)allowedCount
                          keys:(USTKey *_Nullable)keys
                     distances:(Float32 *_Nullable)distances;
- (UInt32)getSingle:(USTKey)key
             vector:(Float32 *_Nonnull)vector
              count:(UInt32)count;

- (void)addDouble:(USTKey)key vector:(Float64 const *_Nonnull)vector;
- (UInt32)searchDouble:(Float64 const *_Nonnull)vector
                 count:(UInt32)count
                  keys:(USTKey *_Nullable)keys
             distances:(Float32 *_Nullable)distances;
- (UInt32)getDouble:(USTKey)key
             vector:(Float64 *_Nonnull)vector
              count:(UInt32)count;

- (void)addI8:(USTKey)key vector:(SInt8 const *_Nonnull)vector;
- (UInt32)searchI8:(SInt8 const *_Nonnull)vector
             count:(UInt32)count
              keys:(USTKey *_Nullable)keys
         distances:(Float32 *_Nullable)distances;

- (Boolean)contains:(USTKey)key;
- (UInt32)count:(USTKey)key;
- (UInt32)remove:(USTKey)key;
- (Boolean)rename:(USTKey)from to:(USTKey)to;

- (void)save:(NSString *)path;
- (void)load:(NSString *)path;
- (void)view:(NSString *)path;
- (void)clear;

@end

NS_ASSUME_NONNULL_END
