// unirec_serve — C++ serving client for unirec_tpu StableHLO artifacts.
//
// Plays the role of the reference's C#/Java ONNX-runtime serving examples
// (reference examples/serving/inference_csharp/Program.cs,
// inference_java/): load an exported model, feed request tensors, return
// scores/embeddings — with NO Python anywhere on the serving path.
//
// The artifact is the StableHLO module written by
// unirec_tpu/serving/export.py (--batch_size > 0 fixed-shape export); the
// runtime is any PJRT C-API plugin (.so exporting GetPjrtApi):
//   libtpu.so on a TPU VM, /opt/axon/libaxon_pjrt.so in this dev
//   environment, or a CPU plugin — the binary is device-agnostic.
//
//   usage: unirec_serve <pjrt_plugin.so> <module.mlir> <inputs.bin> <outputs.bin>
//
// Tensor container format (little-endian), produced/consumed by
// examples/serving_cpp/tensor_io.py:
//   u32 magic 'UTSR' | u32 n_tensors
//   per tensor: u32 dtype (0=f32, 1=s32) | u32 ndim | u64 dims[ndim] | raw data
//
// Build: see examples/serving_cpp/README.md (plain g++, no deps beyond
// libdl — the PJRT C API header is self-contained).

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "unirec_serve: %s\n", msg.c_str());
  std::exit(1);
}

void CheckError(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

void Await(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  CheckError(api, api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  CheckError(api, api->PJRT_Event_Destroy(&dargs), "event destroy");
}

struct Tensor {
  uint32_t dtype = 0;  // 0 = f32, 1 = s32
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;

  size_t num_elements() const {
    size_t n = 1;
    for (int64_t d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

constexpr uint32_t kMagic = 0x55545352;  // 'UTSR'

std::vector<Tensor> ReadTensors(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  uint32_t magic = 0, n = 0;
  f.read(reinterpret_cast<char*>(&magic), 4);
  f.read(reinterpret_cast<char*>(&n), 4);
  if (magic != kMagic) Die(path + ": bad magic");
  std::vector<Tensor> out(n);
  for (auto& t : out) {
    uint32_t ndim = 0;
    f.read(reinterpret_cast<char*>(&t.dtype), 4);
    f.read(reinterpret_cast<char*>(&ndim), 4);
    t.dims.resize(ndim);
    for (auto& d : t.dims) {
      uint64_t v = 0;
      f.read(reinterpret_cast<char*>(&v), 8);
      d = static_cast<int64_t>(v);
    }
    t.data.resize(t.num_elements() * 4);
    f.read(reinterpret_cast<char*>(t.data.data()),
           static_cast<std::streamsize>(t.data.size()));
    if (!f) Die(path + ": truncated tensor data");
  }
  return out;
}

void WriteTensors(const std::string& path, const std::vector<Tensor>& ts) {
  std::ofstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path + " for writing");
  uint32_t n = static_cast<uint32_t>(ts.size());
  f.write(reinterpret_cast<const char*>(&kMagic), 4);
  f.write(reinterpret_cast<const char*>(&n), 4);
  for (const auto& t : ts) {
    uint32_t ndim = static_cast<uint32_t>(t.dims.size());
    f.write(reinterpret_cast<const char*>(&t.dtype), 4);
    f.write(reinterpret_cast<const char*>(&ndim), 4);
    for (int64_t d : t.dims) {
      uint64_t v = static_cast<uint64_t>(d);
      f.write(reinterpret_cast<const char*>(&v), 8);
    }
    f.write(reinterpret_cast<const char*>(t.data.data()),
            static_cast<std::streamsize>(t.data.size()));
  }
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  return std::string(std::istreambuf_iterator<char>(f),
                     std::istreambuf_iterator<char>());
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 5) {
    std::fprintf(stderr,
                 "usage: %s <pjrt_plugin.so> <module.mlir> <inputs.bin> "
                 "<outputs.bin>\n",
                 argv[0]);
    return 2;
  }
  const std::string plugin_path = argv[1], mlir_path = argv[2],
                    in_path = argv[3], out_path = argv[4];

  // ---- load the PJRT plugin
  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) Die(std::string("dlopen: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) Die("plugin has no GetPjrtApi symbol");
  const PJRT_Api* api = get_api();

  PJRT_Plugin_Initialize_Args init_args;
  std::memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CheckError(api, api->PJRT_Plugin_Initialize(&init_args), "plugin init");

  // ---- client + device
  // Optional plugin create-options, supplied as K=V pairs (ints detected
  // numerically) in UNIREC_PJRT_OPTIONS, semicolon-separated. The axon dev
  // plugin, for example, needs
  //   remote_compile=1;local_only=0;priority=0;topology=v5e:1x1x1;
  //   n_slices=1;session_id=<uuid>;rank=4294967295
  // (mirrors axon/register/pjrt.py options), PLUS the process env its
  // sitecustomize exports before PJRT init: AXON_POOL_SVC_OVERRIDE,
  // TPU_WORKER_HOSTNAMES, AXON_COMPAT_VERSION (see tests/test_serving_cpp.py).
  // libtpu on a TPU VM needs none of this.
  std::vector<PJRT_NamedValue> create_opts;
  // deque: pointer stability for c_str() while appending
  std::deque<std::string> opt_store;
  if (const char* env = std::getenv("UNIREC_PJRT_OPTIONS")) {
    std::string all(env);
    size_t pos = 0;
    while (pos < all.size()) {
      size_t end = all.find(';', pos);
      if (end == std::string::npos) end = all.size();
      std::string kv = all.substr(pos, end - pos);
      pos = end + 1;
      size_t eq = kv.find('=');
      if (eq == std::string::npos || kv.empty()) continue;
      opt_store.push_back(kv.substr(0, eq));
      const std::string& key = opt_store.back();
      std::string val = kv.substr(eq + 1);
      PJRT_NamedValue nv;
      std::memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = key.c_str();
      nv.name_size = key.size();
      char* parse_end = nullptr;
      long long as_int = std::strtoll(val.c_str(), &parse_end, 10);
      if (parse_end && *parse_end == '\0' && !val.empty()) {
        nv.type = PJRT_NamedValue_kInt64;
        nv.int64_value = static_cast<int64_t>(as_int);
        nv.value_size = 1;
      } else {
        opt_store.push_back(val);
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = opt_store.back().c_str();
        nv.value_size = opt_store.back().size();
      }
      create_opts.push_back(nv);
    }
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = create_opts.empty() ? nullptr : create_opts.data();
  cargs.num_options = create_opts.size();
  CheckError(api, api->PJRT_Client_Create(&cargs), "client create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  devs.client = client;
  CheckError(api, api->PJRT_Client_AddressableDevices(&devs), "devices");
  if (devs.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = devs.addressable_devices[0];

  // ---- compile the StableHLO module
  std::string mlir = ReadFile(mlir_path);
  static const char kFormat[] = "mlir";
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  // serialized CompileOptionsProto: the exporter writes a valid default
  // next to the modules (some plugins reject an empty blob)
  std::string copts;
  {
    std::string dir = mlir_path.substr(0, mlir_path.find_last_of('/') + 1);
    std::ifstream f(dir + "compile_options.pb", std::ios::binary);
    if (f)
      copts.assign(std::istreambuf_iterator<char>(f),
                   std::istreambuf_iterator<char>());
  }
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  CheckError(api, api->PJRT_Client_Compile(&comp), "compile");
  PJRT_LoadedExecutable* executable = comp.executable;

  // ---- stage inputs
  std::vector<Tensor> inputs = ReadTensors(in_path);
  std::vector<PJRT_Buffer*> arg_buffers(inputs.size());
  for (size_t i = 0; i < inputs.size(); ++i) {
    PJRT_Client_BufferFromHostBuffer_Args b;
    std::memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = client;
    b.data = inputs[i].data.data();
    b.type = inputs[i].dtype == 0 ? PJRT_Buffer_Type_F32
                                  : PJRT_Buffer_Type_S32;
    b.dims = inputs[i].dims.data();
    b.num_dims = inputs[i].dims.size();
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = device;
    CheckError(api, api->PJRT_Client_BufferFromHostBuffer(&b),
               "buffer from host");
    Await(api, b.done_with_host_buffer, "host buffer transfer");
    arg_buffers[i] = b.buffer;
  }

  // ---- execute
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = executable;
  ex.options = &opts;
  PJRT_Buffer* const* arg_list = arg_buffers.data();
  ex.argument_lists = &arg_list;
  ex.num_devices = 1;
  ex.num_args = arg_buffers.size();

  // output list sizing: ask the executable how many outputs it has
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  std::memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = executable;
  CheckError(api, api->PJRT_LoadedExecutable_GetExecutable(&ge),
             "get executable");
  PJRT_Executable_NumOutputs_Args no;
  std::memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  CheckError(api, api->PJRT_Executable_NumOutputs(&no), "num outputs");

  std::vector<PJRT_Buffer*> out_buffers(no.num_outputs);
  PJRT_Buffer** out_list = out_buffers.data();
  ex.output_lists = &out_list;
  PJRT_Event* done = nullptr;
  ex.device_complete_events = &done;
  CheckError(api, api->PJRT_LoadedExecutable_Execute(&ex), "execute");
  Await(api, done, "execution");

  // ---- read back outputs
  std::vector<Tensor> outputs(no.num_outputs);
  for (size_t i = 0; i < out_buffers.size(); ++i) {
    PJRT_Buffer_ElementType_Args et;
    std::memset(&et, 0, sizeof(et));
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = out_buffers[i];
    CheckError(api, api->PJRT_Buffer_ElementType(&et), "element type");
    PJRT_Buffer_Dimensions_Args bd;
    std::memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = out_buffers[i];
    CheckError(api, api->PJRT_Buffer_Dimensions(&bd), "dimensions");

    Tensor& t = outputs[i];
    t.dtype = et.type == PJRT_Buffer_Type_S32 ? 1 : 0;
    t.dims.assign(bd.dims, bd.dims + bd.num_dims);
    t.data.resize(t.num_elements() * 4);

    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_buffers[i];
    th.dst = t.data.data();
    th.dst_size = t.data.size();
    CheckError(api, api->PJRT_Buffer_ToHostBuffer(&th), "to host");
    Await(api, th.event, "device->host copy");
  }
  WriteTensors(out_path, outputs);
  std::fprintf(stderr, "unirec_serve: %zu outputs written to %s\n",
               outputs.size(), out_path.c_str());
  return 0;
}
