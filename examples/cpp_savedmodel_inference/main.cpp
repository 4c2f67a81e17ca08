// Native C++ inference example for drone_yolo_tpu SavedModel artifacts.
//
// Capability parity with the reference's C++ example apps
// (examples/YOLOv8-CPP-Inference, examples/YOLOv8-ONNXRuntime-CPP): load an
// exported end-to-end artifact, letterbox an image with OpenCV, run the
// session, and print/draw detections. Here the artifact is the TF SavedModel
// produced by `yolo-tpu export format=savedmodel nms=True` (XLA graph via
// jax2tf), driven through the TensorFlow C API.
//
// Build: see CMakeLists.txt (links the libtensorflow_cc shipped in the
// tensorflow pip wheel plus OpenCV).
//
// Usage: ./dyt_infer <saved_model_dir> <image> [imgsz=640] [conf=0.25]

#include <tensorflow/c/c_api.h>

#include <opencv2/opencv.hpp>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

static void check(TF_Status* s, const char* what) {
  if (TF_GetCode(s) != TF_OK) {
    std::fprintf(stderr, "%s failed: %s\n", what, TF_Message(s));
    std::exit(1);
  }
}

// Aspect-preserving resize + center pad to (size, size), gray 114 border.
// Returns scale ratio and padding so boxes can be mapped back.
static cv::Mat letterbox(const cv::Mat& img, int size, float& ratio, float& dw, float& dh) {
  ratio = std::min(size / (float)img.cols, size / (float)img.rows);
  ratio = std::min(ratio, 1.0f);  // scaleup=False (val semantics)
  int nw = (int)std::round(img.cols * ratio), nh = (int)std::round(img.rows * ratio);
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(nw, nh), 0, 0, cv::INTER_LINEAR);
  dw = (size - nw) / 2.0f;
  dh = (size - nh) / 2.0f;
  int top = (int)std::round(dh - 0.1f), bottom = (int)std::round(dh + 0.1f);
  int left = (int)std::round(dw - 0.1f), right = (int)std::round(dw + 0.1f);
  cv::Mat out;
  cv::copyMakeBorder(resized, out, top, bottom, left, right, cv::BORDER_CONSTANT,
                     cv::Scalar(114, 114, 114));
  return out;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <saved_model_dir> <image> [imgsz] [conf]\n", argv[0]);
    return 2;
  }
  const char* model_dir = argv[1];
  const char* image_path = argv[2];
  const int imgsz = argc > 3 ? std::atoi(argv[3]) : 640;
  const float conf_thres = argc > 4 ? (float)std::atof(argv[4]) : 0.25f;

  // ---- load the SavedModel ----------------------------------------------
  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  const char* tags[] = {"serve"};
  TF_Session* session =
      TF_LoadSessionFromSavedModel(opts, nullptr, model_dir, tags, 1, graph, nullptr, status);
  check(status, "TF_LoadSessionFromSavedModel");

  TF_Operation* in_op = TF_GraphOperationByName(graph, "serving_default_images");
  TF_Operation* out_op = TF_GraphOperationByName(graph, "StatefulPartitionedCall");
  if (!in_op) in_op = TF_GraphOperationByName(graph, "serving_default_args_0");
  if (!out_op) out_op = TF_GraphOperationByName(graph, "PartitionedCall");
  if (!in_op || !out_op) {
    std::fprintf(stderr, "could not find serving signature ops in graph\n");
    return 1;
  }

  // ---- preprocess ---------------------------------------------------------
  cv::Mat bgr = cv::imread(image_path);
  if (bgr.empty()) {
    std::fprintf(stderr, "cannot read %s\n", image_path);
    return 1;
  }
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  float ratio, dw, dh;
  cv::Mat boxed = letterbox(rgb, imgsz, ratio, dw, dh);

  const int64_t dims[4] = {1, imgsz, imgsz, 3};
  const size_t nbytes = (size_t)imgsz * imgsz * 3 * sizeof(float);
  TF_Tensor* input = TF_AllocateTensor(TF_FLOAT, dims, 4, nbytes);
  float* dst = (float*)TF_TensorData(input);
  for (int y = 0; y < imgsz; ++y) {
    const uchar* row = boxed.ptr<uchar>(y);
    for (int x = 0; x < imgsz * 3; ++x) dst[y * imgsz * 3 + x] = row[x] / 255.0f;
  }

  // ---- run ----------------------------------------------------------------
  TF_Output in_port{in_op, 0};
  TF_Output out_ports[2] = {{out_op, 0}, {out_op, 1}};
  TF_Tensor* outputs[2] = {nullptr, nullptr};
  const int n_out = TF_OperationNumOutputs(out_op) >= 2 ? 2 : 1;
  TF_SessionRun(session, nullptr, &in_port, &input, 1, out_ports, outputs, n_out, nullptr, 0,
                nullptr, status);
  check(status, "TF_SessionRun");

  // ---- postprocess: artifact exported with nms=True yields ----------------
  //   dets (1, max_det, 6) [x1 y1 x2 y2 conf cls], n_valid (1,)
  const float* dets = (const float*)TF_TensorData(outputs[0]);
  int max_det = (int)TF_Dim(outputs[0], 1);
  int n_valid = max_det;
  if (n_out == 2 && TF_TensorType(outputs[1]) == TF_INT32) {
    n_valid = ((const int32_t*)TF_TensorData(outputs[1]))[0];
  }
  int kept = 0;
  for (int i = 0; i < n_valid && i < max_det; ++i) {
    const float* d = dets + i * 6;
    if (d[4] < conf_thres) continue;
    // map from letterboxed to original coordinates
    float x1 = (d[0] - dw) / ratio, y1 = (d[1] - dh) / ratio;
    float x2 = (d[2] - dw) / ratio, y2 = (d[3] - dh) / ratio;
    std::printf("det %d: cls=%d conf=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n", kept, (int)d[5], d[4],
                x1, y1, x2, y2);
    cv::rectangle(bgr, cv::Point((int)x1, (int)y1), cv::Point((int)x2, (int)y2),
                  cv::Scalar(0, 255, 0), 2);
    ++kept;
  }
  std::printf("detections: %d\n", kept);
  cv::imwrite("cpp_inference_out.jpg", bgr);

  for (int i = 0; i < n_out; ++i)
    if (outputs[i]) TF_DeleteTensor(outputs[i]);
  TF_DeleteTensor(input);
  TF_CloseSession(session, status);
  TF_DeleteSession(session, status);
  TF_DeleteSessionOptions(opts);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  return 0;
}
