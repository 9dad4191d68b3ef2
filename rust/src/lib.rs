//! Rust binding for the usearch_tpu engine over its C ABI (c/usearch_tpu.h).
//!
//! The reference's Rust binding goes through a cxx bridge into the C++
//! header (reference: rust/lib.rs + lib.cpp); this binding links the same
//! C ABI every other language wraps — plain `extern "C"` FFI, no C++ glue.
//!
//! Build: `make -C ../c libusearch_tpu.so`, then `cargo build` (build.rs
//! emits the link-search path). NOTE: no Rust toolchain ships in the
//! development image this crate was authored in; the binding is
//! source-complete and mirrors the tested C smoke test (c/test.c)
//! call-for-call, but has not itself been compiled.

use std::ffi::{c_char, c_void, CStr, CString};
use std::ptr;

pub type Key = u64;
pub type Distance = f32;

#[repr(u32)]
#[derive(Clone, Copy, Debug, PartialEq, Eq, Default)]
pub enum MetricKind {
    Unknown = 0,
    #[default]
    Cos = 1,
    IP = 2,
    L2sq = 3,
    Haversine = 4,
    Divergence = 5,
    Pearson = 6,
    Jaccard = 7,
    Hamming = 8,
    Tanimoto = 9,
    Sorensen = 10,
}

#[repr(u32)]
#[derive(Clone, Copy, Debug, PartialEq, Eq, Default)]
pub enum ScalarKind {
    Unknown = 0,
    #[default]
    F32 = 1,
    F64 = 2,
    F16 = 3,
    BF16 = 4,
    I8 = 5,
    B1 = 6,
}

#[repr(C)]
#[derive(Clone, Copy)]
struct InitOptions {
    metric_kind: u32,
    metric: *const c_void,
    quantization: u32,
    dimensions: usize,
    connectivity: usize,
    expansion_add: usize,
    expansion_search: usize,
    multi: bool,
}

type ErrorPtr = *const c_char;

extern "C" {
    fn usearch_version() -> *const c_char;
    fn usearch_init(options: *mut InitOptions, error: *mut ErrorPtr) -> *mut c_void;
    fn usearch_free(index: *mut c_void, error: *mut ErrorPtr);
    fn usearch_size(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_capacity(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_dimensions(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_connectivity(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_reserve(index: *mut c_void, capacity: usize, error: *mut ErrorPtr);
    fn usearch_memory_usage(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_serialized_length(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_hardware_acceleration(index: *mut c_void, error: *mut ErrorPtr) -> *const c_char;
    fn usearch_expansion_add(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_expansion_search(index: *mut c_void, error: *mut ErrorPtr) -> usize;
    fn usearch_change_expansion_add(index: *mut c_void, expansion: usize, error: *mut ErrorPtr);
    fn usearch_change_expansion_search(index: *mut c_void, expansion: usize, error: *mut ErrorPtr);
    fn usearch_change_metric_kind(index: *mut c_void, kind: u32, error: *mut ErrorPtr);
    fn usearch_add(index: *mut c_void, key: Key, vector: *const c_void, kind: u32, error: *mut ErrorPtr);
    fn usearch_contains(index: *mut c_void, key: Key, error: *mut ErrorPtr) -> bool;
    fn usearch_count(index: *mut c_void, key: Key, error: *mut ErrorPtr) -> usize;
    fn usearch_search(
        index: *mut c_void, query: *const c_void, kind: u32, count: usize,
        keys: *mut Key, distances: *mut Distance, error: *mut ErrorPtr) -> usize;
    fn usearch_filtered_search(
        index: *mut c_void, query: *const c_void, kind: u32, count: usize,
        allowed_keys: *const Key, allowed_count: usize,
        keys: *mut Key, distances: *mut Distance, error: *mut ErrorPtr) -> usize;
    fn usearch_get(
        index: *mut c_void, key: Key, count: usize, vectors: *mut c_void, kind: u32,
        error: *mut ErrorPtr) -> usize;
    fn usearch_remove(index: *mut c_void, key: Key, error: *mut ErrorPtr) -> usize;
    fn usearch_rename(index: *mut c_void, from: Key, to: Key, error: *mut ErrorPtr) -> usize;
    fn usearch_clear(index: *mut c_void, error: *mut ErrorPtr);
    fn usearch_save(index: *mut c_void, path: *const c_char, error: *mut ErrorPtr);
    fn usearch_load(index: *mut c_void, path: *const c_char, error: *mut ErrorPtr);
    fn usearch_view(index: *mut c_void, path: *const c_char, error: *mut ErrorPtr);
    fn usearch_save_buffer(index: *mut c_void, buffer: *mut c_void, length: usize, error: *mut ErrorPtr);
    fn usearch_load_buffer(index: *mut c_void, buffer: *const c_void, length: usize, error: *mut ErrorPtr);
    fn usearch_distance(
        a: *const c_void, b: *const c_void, kind: u32, dimensions: usize, metric: u32,
        error: *mut ErrorPtr) -> Distance;
}

#[derive(Debug)]
pub struct Error(pub String);

impl std::fmt::Display for Error {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "usearch_tpu: {}", self.0)
    }
}
impl std::error::Error for Error {}

pub type Result<T> = std::result::Result<T, Error>;

fn check(err: ErrorPtr) -> Result<()> {
    if err.is_null() {
        Ok(())
    } else {
        Err(Error(unsafe { CStr::from_ptr(err) }.to_string_lossy().into_owned()))
    }
}

/// Index configuration (usearch_init_options_t, c/usearch_tpu.h:57).
#[derive(Clone, Copy, Debug, Default)]
pub struct IndexOptions {
    pub metric: MetricKind,
    pub quantization: ScalarKind,
    pub dimensions: usize,
    pub connectivity: usize,
    pub expansion_add: usize,
    pub expansion_search: usize,
    pub multi: bool,
}

/// One dense usearch_tpu index. `Send` but not `Sync`: external
/// synchronization is required for concurrent use (the C layer serializes
/// on the embedded interpreter anyway). `dimensions` is interior-mutable
/// because load/view replace the constructor's configuration with the
/// file's (the stored width may differ).
pub struct Index {
    handle: *mut c_void,
    dimensions: std::cell::Cell<usize>,
}

unsafe impl Send for Index {}

impl Index {
    pub fn new(options: &IndexOptions) -> Result<Self> {
        let mut raw = InitOptions {
            metric_kind: options.metric as u32,
            metric: ptr::null(),
            quantization: options.quantization as u32,
            dimensions: options.dimensions,
            connectivity: options.connectivity,
            expansion_add: options.expansion_add,
            expansion_search: options.expansion_search,
            multi: options.multi,
        };
        let mut err: ErrorPtr = ptr::null();
        let handle = unsafe { usearch_init(&mut raw, &mut err) };
        check(err)?;
        Ok(Index { handle, dimensions: std::cell::Cell::new(options.dimensions) })
    }

    pub fn version() -> String {
        unsafe { CStr::from_ptr(usearch_version()) }.to_string_lossy().into_owned()
    }

    fn size_t_call(&self, f: unsafe extern "C" fn(*mut c_void, *mut ErrorPtr) -> usize) -> Result<usize> {
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe { f(self.handle, &mut err) };
        check(err)?;
        Ok(n)
    }

    pub fn size(&self) -> Result<usize> { self.size_t_call(usearch_size) }
    pub fn capacity(&self) -> Result<usize> { self.size_t_call(usearch_capacity) }
    pub fn dimensions(&self) -> Result<usize> { self.size_t_call(usearch_dimensions) }
    pub fn connectivity(&self) -> Result<usize> { self.size_t_call(usearch_connectivity) }
    pub fn memory_usage(&self) -> Result<usize> { self.size_t_call(usearch_memory_usage) }
    pub fn serialized_length(&self) -> Result<usize> { self.size_t_call(usearch_serialized_length) }
    pub fn expansion_add(&self) -> Result<usize> { self.size_t_call(usearch_expansion_add) }
    pub fn expansion_search(&self) -> Result<usize> { self.size_t_call(usearch_expansion_search) }

    pub fn hardware_acceleration(&self) -> Result<String> {
        let mut err: ErrorPtr = ptr::null();
        let s = unsafe { usearch_hardware_acceleration(self.handle, &mut err) };
        check(err)?;
        Ok(unsafe { CStr::from_ptr(s) }.to_string_lossy().into_owned())
    }

    pub fn reserve(&self, capacity: usize) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_reserve(self.handle, capacity, &mut err) };
        check(err)
    }

    pub fn change_expansion_add(&self, v: usize) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_change_expansion_add(self.handle, v, &mut err) };
        check(err)
    }

    pub fn change_expansion_search(&self, v: usize) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_change_expansion_search(self.handle, v, &mut err) };
        check(err)
    }

    pub fn change_metric_kind(&self, kind: MetricKind) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_change_metric_kind(self.handle, kind as u32, &mut err) };
        check(err)
    }

    fn check_dims(&self, n: usize) -> Result<()> {
        if n != self.dimensions.get() {
            return Err(Error(format!(
                "vector has {} dimensions, index expects {}", n, self.dimensions.get())));
        }
        Ok(())
    }

    pub fn add(&self, key: Key, vector: &[f32]) -> Result<()> {
        self.check_dims(vector.len())?;
        let mut err: ErrorPtr = ptr::null();
        unsafe {
            usearch_add(self.handle, key, vector.as_ptr().cast(), ScalarKind::F32 as u32, &mut err)
        };
        check(err)
    }

    pub fn add_i8(&self, key: Key, vector: &[i8]) -> Result<()> {
        self.check_dims(vector.len())?;
        let mut err: ErrorPtr = ptr::null();
        unsafe {
            usearch_add(self.handle, key, vector.as_ptr().cast(), ScalarKind::I8 as u32, &mut err)
        };
        check(err)
    }

    pub fn search(&self, query: &[f32], count: usize) -> Result<(Vec<Key>, Vec<Distance>)> {
        self.check_dims(query.len())?;
        let mut keys = vec![0 as Key; count];
        let mut dists = vec![0.0 as Distance; count];
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe {
            usearch_search(self.handle, query.as_ptr().cast(), ScalarKind::F32 as u32,
                count, keys.as_mut_ptr(), dists.as_mut_ptr(), &mut err)
        };
        check(err)?;
        keys.truncate(n);
        dists.truncate(n);
        Ok((keys, dists))
    }

    /// An EMPTY allow-list allows nothing and returns no results; use
    /// `search` for an unfiltered query.
    pub fn filtered_search(
        &self, query: &[f32], count: usize, allowed: &[Key],
    ) -> Result<(Vec<Key>, Vec<Distance>)> {
        self.check_dims(query.len())?;
        if count == 0 || allowed.is_empty() {
            return Ok((Vec::new(), Vec::new()));
        }
        let mut keys = vec![0 as Key; count];
        let mut dists = vec![0.0 as Distance; count];
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe {
            usearch_filtered_search(self.handle, query.as_ptr().cast(),
                ScalarKind::F32 as u32, count, allowed.as_ptr(), allowed.len(),
                keys.as_mut_ptr(), dists.as_mut_ptr(), &mut err)
        };
        check(err)?;
        keys.truncate(n);
        dists.truncate(n);
        Ok((keys, dists))
    }

    pub fn get(&self, key: Key) -> Result<Option<Vec<f32>>> {
        let mut out = vec![0.0f32; self.dimensions.get()];
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe {
            usearch_get(self.handle, key, 1, out.as_mut_ptr().cast(),
                ScalarKind::F32 as u32, &mut err)
        };
        check(err)?;
        Ok(if n == 0 { None } else { Some(out) })
    }

    pub fn contains(&self, key: Key) -> Result<bool> {
        let mut err: ErrorPtr = ptr::null();
        let found = unsafe { usearch_contains(self.handle, key, &mut err) };
        check(err)?;
        Ok(found)
    }

    pub fn count(&self, key: Key) -> Result<usize> {
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe { usearch_count(self.handle, key, &mut err) };
        check(err)?;
        Ok(n)
    }

    pub fn remove(&self, key: Key) -> Result<usize> {
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe { usearch_remove(self.handle, key, &mut err) };
        check(err)?;
        Ok(n)
    }

    pub fn rename(&self, from: Key, to: Key) -> Result<usize> {
        let mut err: ErrorPtr = ptr::null();
        let n = unsafe { usearch_rename(self.handle, from, to, &mut err) };
        check(err)?;
        Ok(n)
    }

    pub fn clear(&self) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_clear(self.handle, &mut err) };
        check(err)
    }

    fn path_call(
        &self, f: unsafe extern "C" fn(*mut c_void, *const c_char, *mut ErrorPtr), path: &str,
    ) -> Result<()> {
        let cpath = CString::new(path).map_err(|e| Error(e.to_string()))?;
        let mut err: ErrorPtr = ptr::null();
        unsafe { f(self.handle, cpath.as_ptr(), &mut err) };
        check(err)
    }

    /// Re-read engine-side geometry after load/view: the file's
    /// configuration replaces the constructor's.
    fn refresh_config(&self) -> Result<()> {
        self.dimensions.set(self.size_t_call(usearch_dimensions)?);
        Ok(())
    }

    pub fn save(&self, path: &str) -> Result<()> { self.path_call(usearch_save, path) }

    pub fn load(&self, path: &str) -> Result<()> {
        self.path_call(usearch_load, path)?;
        self.refresh_config()
    }

    pub fn view(&self, path: &str) -> Result<()> {
        self.path_call(usearch_view, path)?;
        self.refresh_config()
    }

    pub fn save_buffer(&self) -> Result<Vec<u8>> {
        let mut buf = vec![0u8; self.serialized_length()?];
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_save_buffer(self.handle, buf.as_mut_ptr().cast(), buf.len(), &mut err) };
        check(err)?;
        Ok(buf)
    }

    pub fn load_buffer(&self, buf: &[u8]) -> Result<()> {
        let mut err: ErrorPtr = ptr::null();
        unsafe { usearch_load_buffer(self.handle, buf.as_ptr().cast(), buf.len(), &mut err) };
        check(err)?;
        self.refresh_config()
    }
}

impl Drop for Index {
    fn drop(&mut self) {
        if !self.handle.is_null() {
            let mut err: ErrorPtr = ptr::null();
            unsafe { usearch_free(self.handle, &mut err) };
            self.handle = ptr::null_mut();
        }
    }
}

/// Standalone pairwise distance (usearch_distance, c/usearch_tpu.h:150).
pub fn distance(a: &[f32], b: &[f32], metric: MetricKind) -> Result<Distance> {
    if a.len() != b.len() {
        return Err(Error(format!("dimension mismatch: {} vs {}", a.len(), b.len())));
    }
    let mut err: ErrorPtr = ptr::null();
    let d = unsafe {
        usearch_distance(a.as_ptr().cast(), b.as_ptr().cast(),
            ScalarKind::F32 as u32, a.len(), metric as u32, &mut err)
    };
    check(err)?;
    Ok(d)
}
