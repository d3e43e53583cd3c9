//! CLI entry: load an exported ONNX detect model, run one image, save the
//! annotated result. Mirrors the reference example's flow
//! (examples/YOLOv8-ONNXRuntime-Rust/src/main.rs) on the ort 2.x API.

mod model;
mod postprocess;

use anyhow::Result;
use clap::Parser;

#[derive(Parser, Debug)]
#[command(about = "ONNX Runtime consumer for experiment_yolo_tpu exports")]
pub struct Args {
    /// Path to the exported .onnx model
    #[arg(long)]
    pub model: String,

    /// Input image path
    #[arg(long)]
    pub source: String,

    /// Confidence threshold
    #[arg(long, default_value_t = 0.25)]
    pub conf: f32,

    /// IoU threshold for NMS
    #[arg(long, default_value_t = 0.7)]
    pub iou: f32,

    /// Inference size (square letterbox)
    #[arg(long, default_value_t = 640)]
    pub imgsz: u32,

    /// Output path for the annotated image
    #[arg(long, default_value = "out.jpg")]
    pub output: String,
}

fn main() -> Result<()> {
    let args = Args::parse();
    let mut yolo = model::Yolo::new(&args.model, args.imgsz)?;

    let img = image::open(&args.source)?.to_rgb8();
    let dets = yolo.run(&img, args.conf, args.iou)?;

    println!("{} detections", dets.len());
    for d in &dets {
        println!(
            "class={} conf={:.3} xyxy=({:.1}, {:.1}, {:.1}, {:.1})",
            d.class, d.conf, d.x1, d.y1, d.x2, d.y2
        );
    }

    let annotated = postprocess::draw(img, &dets);
    annotated.save(&args.output)?;
    println!("saved {}", args.output);
    Ok(())
}
