interface Props {
  label: string;
  value: number | null;
  placeholder?: string;
  onChange: (value: number | null) => void;
}

export default function NumberInput({
  label,
  value,
  placeholder,
  onChange,
}: Props) {
  return (
    <label className="labeled-input">
      <span>{label}</span>
      <input
        type="number"
        value={value ?? ""}
        placeholder={placeholder}
        onChange={(e) =>
          onChange(e.target.value === "" ? null : Number(e.target.value))
        }
      />
    </label>
  );
}
