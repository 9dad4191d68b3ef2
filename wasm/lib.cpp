// WASM build surface — mirrors the reference's wasm/lib.cpp, which is a
// stub translation unit re-exporting the C ABI (reference: wasm/lib.cpp:1-5).
// Compile with an emscripten-style toolchain against c/lib.cpp; the exported
// symbols are the full usearch_tpu C interface (c/usearch_tpu.h).
#include "../c/lib.cpp"  // NOLINT(bugprone-suspicious-include)
