/**
 * JavaScript binding for the usearch_tpu engine, wrapping its C ABI
 * (c/usearch_tpu.h) compiled to WebAssembly.
 *
 * The reference ships a Node N-API addon (reference: javascript/lib.cpp +
 * usearch.ts); this binding instead rides the WASM build of the same C ABI
 * (wasm/lib.cpp), so one artifact serves Node AND browsers:
 *
 *   emcc ../wasm/lib.cpp -I../c -O2 -sEXPORTED_FUNCTIONS=@exports.json \
 *        -sEXPORTED_RUNTIME_METHODS=ccall,cwrap,HEAPU8 -o usearch_tpu_wasm.mjs
 *
 * NOTE: no emscripten/Node toolchain ships in the development image this
 * file was authored in; the binding is source-complete and mirrors the
 * tested C smoke test (c/test.c) call-for-call, but has not itself run.
 * The C ABI implementation embeds CPython (c/lib.cpp), so the WASM build
 * carries the same caveat as the reference's 5-line wasm stub: it is the
 * ABI surface, not a self-contained in-browser engine. For production JS
 * use, run the engine behind the RPC server (usearch_tpu/server.py) or
 * link this module against a native Node build of the C ABI.
 */

const METRICS = {
  cos: 1, ip: 2, l2sq: 3, haversine: 4, divergence: 5,
  pearson: 6, jaccard: 7, hamming: 8, tanimoto: 9, sorensen: 10,
};
const SCALARS = { f32: 1, f64: 2, f16: 3, bf16: 4, i8: 5, b1: 6 };

/** Size of usearch_init_options_t on wasm32 (c/usearch_tpu.h:57):
 *  i32 metric_kind, ptr metric, i32 quantization, 4×size_t, bool + pad. */
const OPTIONS_BYTES = 32;

let Module = null;

/** Load the WASM module once. Pass the emcc-emitted factory module path. */
export async function init(wasmFactory) {
  if (Module) return;
  const factory = wasmFactory ?? (await import("./usearch_tpu_wasm.mjs")).default;
  Module = await factory();
}

function must() {
  if (!Module) throw new Error("usearch_tpu: call await init() first");
  return Module;
}

class NativeCall {
  constructor(m) {
    this.m = m;
    this.errPtr = m._malloc(4);
  }
  /** Run fn with an error-out slot; throw the C error string if set.
   *  errPtr stays owned by this NativeCall — the caller's finally block
   *  frees it exactly once via free(), error or not. */
  run(fn) {
    const m = this.m;
    m.HEAPU32[this.errPtr >> 2] = 0;
    const out = fn(this.errPtr);
    const err = m.HEAPU32[this.errPtr >> 2];
    if (err !== 0) {
      throw new Error(`usearch_tpu: ${m.UTF8ToString(err)}`);
    }
    return out;
  }
  free() {
    if (this.errPtr) {
      this.m._free(this.errPtr);
      this.errPtr = 0;
    }
  }
}

function withScratch(m, bytes, fn) {
  const ptr = m._malloc(bytes);
  try { return fn(ptr); } finally { m._free(ptr); }
}

export class Index {
  /**
   * @param {{metric?: string, quantization?: string, dimensions: number,
   *          connectivity?: number, expansionAdd?: number,
   *          expansionSearch?: number, multi?: boolean}} config
   */
  constructor(config) {
    const m = must();
    const metric = METRICS[config.metric ?? "cos"];
    const quant = SCALARS[config.quantization ?? "f32"];
    if (!metric) throw new Error(`unknown metric ${config.metric}`);
    if (!quant) throw new Error(`unknown quantization ${config.quantization}`);
    this.dimensions = config.dimensions | 0;
    const call = new NativeCall(m);
    try {
      this.ptr = withScratch(m, OPTIONS_BYTES, (opts) => {
        m.HEAPU8.fill(0, opts, opts + OPTIONS_BYTES);
        m.HEAPU32[(opts + 0) >> 2] = metric;
        m.HEAPU32[(opts + 4) >> 2] = 0; // custom metric fn ptr
        m.HEAPU32[(opts + 8) >> 2] = quant;
        m.HEAPU32[(opts + 12) >> 2] = this.dimensions;
        m.HEAPU32[(opts + 16) >> 2] = config.connectivity ?? 0;
        m.HEAPU32[(opts + 20) >> 2] = config.expansionAdd ?? 0;
        m.HEAPU32[(opts + 24) >> 2] = config.expansionSearch ?? 0;
        m.HEAPU8[opts + 28] = config.multi ? 1 : 0;
        return call.run((e) => m._usearch_init(opts, e));
      });
    } finally {
      call.free();
    }
  }

  destroy() {
    if (!this.ptr) return;
    const m = must();
    const call = new NativeCall(m);
    try { call.run((e) => m._usearch_free(this.ptr, e)); }
    finally { call.free(); this.ptr = 0; }
  }

  _sizeT(name) {
    const m = must();
    const call = new NativeCall(m);
    try { return call.run((e) => m[`_usearch_${name}`](this.ptr, e)); }
    finally { call.free(); }
  }

  size() { return this._sizeT("size"); }
  capacity() { return this._sizeT("capacity"); }
  connectivity() { return this._sizeT("connectivity"); }
  serializedLength() { return this._sizeT("serialized_length"); }
  memoryUsage() { return this._sizeT("memory_usage"); }

  reserve(capacity) {
    const m = must();
    const call = new NativeCall(m);
    try { call.run((e) => m._usearch_reserve(this.ptr, capacity, e)); }
    finally { call.free(); }
  }

  /** @param {number|bigint} key @param {Float32Array|number[]} vector */
  add(key, vector) {
    const m = must();
    const vec = vector instanceof Float32Array ? vector : Float32Array.from(vector);
    if (vec.length !== this.dimensions)
      throw new Error(`vector has ${vec.length} dimensions, index expects ${this.dimensions}`);
    const call = new NativeCall(m);
    try {
      withScratch(m, vec.byteLength, (p) => {
        m.HEAPU8.set(new Uint8Array(vec.buffer, vec.byteOffset, vec.byteLength), p);
        call.run((e) => m._usearch_add(this.ptr, BigInt(key), p, SCALARS.f32, e));
      });
    } finally {
      call.free();
    }
  }

  /**
   * @returns {{keys: BigUint64Array, distances: Float32Array}}
   */
  search(vector, count) {
    const m = must();
    const vec = vector instanceof Float32Array ? vector : Float32Array.from(vector);
    if (vec.length !== this.dimensions)
      throw new Error(`query has ${vec.length} dimensions, index expects ${this.dimensions}`);
    const call = new NativeCall(m);
    try {
      return withScratch(m, vec.byteLength + count * 12, (p) => {
        const keysPtr = p + vec.byteLength;
        const distsPtr = keysPtr + count * 8;
        m.HEAPU8.set(new Uint8Array(vec.buffer, vec.byteOffset, vec.byteLength), p);
        const n = call.run((e) =>
          m._usearch_search(this.ptr, p, SCALARS.f32, count, keysPtr, distsPtr, e));
        const keys = new BigUint64Array(m.HEAPU8.buffer.slice(keysPtr, keysPtr + n * 8));
        const distances = new Float32Array(m.HEAPU8.buffer.slice(distsPtr, distsPtr + n * 4));
        return { keys, distances };
      });
    } finally {
      call.free();
    }
  }

  contains(key) {
    const m = must();
    const call = new NativeCall(m);
    try { return !!call.run((e) => m._usearch_contains(this.ptr, BigInt(key), e)); }
    finally { call.free(); }
  }

  count(key) {
    const m = must();
    const call = new NativeCall(m);
    try { return call.run((e) => m._usearch_count(this.ptr, BigInt(key), e)); }
    finally { call.free(); }
  }

  remove(key) {
    const m = must();
    const call = new NativeCall(m);
    try { return call.run((e) => m._usearch_remove(this.ptr, BigInt(key), e)); }
    finally { call.free(); }
  }

  rename(from, to) {
    const m = must();
    const call = new NativeCall(m);
    try { return call.run((e) => m._usearch_rename(this.ptr, BigInt(from), BigInt(to), e)); }
    finally { call.free(); }
  }

  /** @returns {Float32Array|null} */
  get(key) {
    const m = must();
    const call = new NativeCall(m);
    try {
      return withScratch(m, this.dimensions * 4, (p) => {
        const n = call.run((e) =>
          m._usearch_get(this.ptr, BigInt(key), 1, p, SCALARS.f32, e));
        if (n === 0) return null;
        return new Float32Array(m.HEAPU8.buffer.slice(p, p + this.dimensions * 4));
      });
    } finally {
      call.free();
    }
  }

  clear() {
    const m = must();
    const call = new NativeCall(m);
    try { call.run((e) => m._usearch_clear(this.ptr, e)); }
    finally { call.free(); }
  }

  /** Serialize to bytes (save_buffer under the hood). */
  saveBuffer() {
    const m = must();
    const len = this.serializedLength();
    const call = new NativeCall(m);
    try {
      return withScratch(m, len, (p) => {
        call.run((e) => m._usearch_save_buffer(this.ptr, p, len, e));
        return new Uint8Array(m.HEAPU8.buffer.slice(p, p + len));
      });
    } finally {
      call.free();
    }
  }

  /** Restore from bytes produced by saveBuffer(). */
  loadBuffer(bytes) {
    const m = must();
    const call = new NativeCall(m);
    try {
      withScratch(m, bytes.length, (p) => {
        m.HEAPU8.set(bytes, p);
        call.run((e) => m._usearch_load_buffer(this.ptr, p, bytes.length, e));
      });
      // the file's configuration replaces the constructor's
      this.dimensions = call.run((e) => m._usearch_dimensions(this.ptr, e));
    } finally {
      call.free();
    }
  }
}

export { METRICS, SCALARS };
